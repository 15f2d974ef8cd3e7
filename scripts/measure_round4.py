"""Round-4 chip measurements of full-search variants, host-fetch fenced (the
axon backend's block_until_ready returns early — round-3 finding).

Variants (full 64-node 9x9 512x4 bf16 search, K=8):
  r3-prod      — scan + pallas walk, XLA solve (round-3 default, ~520ms @16k)
  scan-ksolve  — scan + pallas walk + solve kernel (probs output)
  scan-asolve  — scan + alpha-only solve kernel (best scan variant)
  grow-xsolve  — triangular passes + PADDED pallas walk, XLA solve
                 (the round-4 production default path)
  grow-ksolve / grow-asolve — grow + solve kernel (probs / alpha output;
                 both chip-measured SLOWER than grow-xsolve)
  walk128/256/512 — walk-kernel block sweep on the grow path
  rows256/512/1024 — solve-kernel block sweep on the scan path

Usage: python scripts/measure_round4.py [n_envs] [variants...]
"""
import sys, os, time, json, dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search, root
from boardlaw_tpu.train import TrainConfig, build_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024
WHICH = sys.argv[2:] or ["r3-prod", "scan-ksolve", "grow-xsolve", "grow-ksolve"]
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
        "r3-prod": dataclasses.replace(base, pallas_solve=False),
        "scan-ksolve": dataclasses.replace(base, pallas_solve=True),
        "grow-xsolve": dataclasses.replace(base, grow_passes=True,
                                           pallas_solve=False),
        "grow-ksolve": dataclasses.replace(base, grow_passes=True,
                                           pallas_solve=True),
        "grow-asolve": dataclasses.replace(base, grow_passes=True,
                                           pallas_solve="alpha"),
        "scan-asolve": dataclasses.replace(base, pallas_solve="alpha"),
        "grow-k16": dataclasses.replace(base, grow_passes=True,
                                        pallas_solve=False,
                                        leaves_per_pass=16),
        "grow-k4": dataclasses.replace(base, grow_passes=True,
                                       pallas_solve=False,
                                       leaves_per_pass=4),
        "walk128": dataclasses.replace(base, grow_passes=True,
                                       pallas_solve=False,
                                       pallas_walk_envs=128),
        "walk256": dataclasses.replace(base, grow_passes=True,
                                       pallas_solve=False,
                                       pallas_walk_envs=256),
        "walk512": dataclasses.replace(base, grow_passes=True,
                                       pallas_solve=False,
                                       pallas_walk_envs=512),
        "rows256": dataclasses.replace(base, pallas_solve=True,
                                       pallas_solve_rows=256),
        "rows512": dataclasses.replace(base, pallas_solve=True,
                                       pallas_solve_rows=512),
        "rows1024": dataclasses.replace(base, pallas_solve=True,
                                        pallas_solve_rows=1024),
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
