"""Round-3 chip measurements with CORRECT fencing: `block_until_ready`
returns before compute finishes on the axon backend (round-3 finding), so
every timing here fences with a host fetch of a scalar that depends on the
full computation.

Measures the full 64-node 9x9 512x4 search end-to-end (the honest sims/s
number) across search variants:
  scan+pallas-walk  — round-2 production default
  scan+xla-walk     — capped unrolled XLA pointer chase
  grow              — triangular passes (round-3: solve/sample only live rows)

Usage: python scripts/measure_round3.py [n_envs] [variants...]
"""
import sys, os, time, json, dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search, root
from boardlaw_tpu.train import TrainConfig, build_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024
WHICH = sys.argv[2:] or ["scan-pallas", "scan-xla", "grow"]
REPS = 4


def main():
    base = TrainConfig(boardsize=9, width=512, depth=4, n_nodes=64,
                       dtype="bfloat16", tree_dtype="bfloat16",
                       use_pallas=False, leaves_per_pass=8)
    model = build_model(base)
    world = hex.Hex.initial(B, base.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    variants = {
        "scan-pallas": base,  # pallas_walk auto -> ON on TPU
        "scan-xla": dataclasses.replace(base, pallas_walk=False,
                                        pallas_sample=False),
        "grow": dataclasses.replace(base, grow_passes=True),
        # walk kernel only: the K-sampler kernel measured 89ms/pass vs the
        # XLA solve+sample's 24ms (see MCTSConfig.pallas_nodes note), so the
        # interesting grow combination is triangular passes + early-exit walk
        "grow-pallas": dataclasses.replace(base, grow_passes=True,
                                           pallas_walk=True),
    }

    for name in WHICH:
        cfg = variants[name]
        mcfg = cfg.mcts_config()

        @jax.jit
        def full_search(world, key, mcfg=mcfg):
            tree = search.mcts(world, eval_fn, key, mcfg)
            r = root(tree)
            return r["v"].sum()  # host-fetch fence

        try:
            t0 = time.time()
            fence = full_search(world, jax.random.PRNGKey(1))
            float(fence)
            compile_s = time.time() - t0
            best = float("inf")
            for i in range(REPS):
                t0 = time.perf_counter()
                fence = full_search(world, jax.random.fold_in(jax.random.PRNGKey(2), i))
                float(fence)
                best = min(best, time.perf_counter() - t0)
            sims = B * (cfg.n_nodes - 1)
            print(json.dumps({
                "name": name, "search_s": round(best, 4),
                "sims_per_s": round(sims / best),
                "samples_per_s": round(B / best),
                "compile_s": round(compile_s, 1), "n_envs": B,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"name": name,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
