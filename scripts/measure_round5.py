"""Round-5 chip measurements, host-fetch fenced (block_until_ready returns
early on the axon backend — every timing below fences with a host fetch).

Focus: the backup-stage roofline gap (r4 VERDICT next-step #2) and the K=16
promotion. Variants (full 64-node 9x9 512x4 bf16 search, grow passes):

  grow-einsum     — round-4 production default (einsum backup, K=8)
  grow-prefix     — prefix backup (backup_mode='prefix', K=8) — r5 candidate
  grow-prefix-k16 / grow-einsum-k16 — the K=16 pair
  prefix-walk512 / prefix-walk1024  — walk block sweep on the prefix path
  prefix-k16-walk512               — combined best-guess config

Usage: python scripts/measure_round5.py [n_envs] [variants...]
"""
import sys, os, time, json, dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search, root
from boardlaw_tpu.train import TrainConfig, build_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024
WHICH = sys.argv[2:] or ["grow-einsum", "grow-prefix", "grow-prefix-k16"]
REPS = 4


def main():
    base = TrainConfig(boardsize=9, width=512, depth=4, n_nodes=64,
                       dtype="bfloat16", tree_dtype="bfloat16",
                       use_pallas=False, leaves_per_pass=8,
                       grow_passes=True)
    model = build_model(base)
    world = hex.Hex.initial(B, base.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    variants = {
        "grow-einsum": dataclasses.replace(base, backup_mode="einsum"),
        "grow-prefix": base,
        "grow-einsum-k16": dataclasses.replace(base, backup_mode="einsum",
                                               leaves_per_pass=16),
        "grow-prefix-k16": dataclasses.replace(base, leaves_per_pass=16),
        "prefix-walk512": dataclasses.replace(base, pallas_walk_envs=512),
        "prefix-walk1024": dataclasses.replace(base, pallas_walk_envs=1024),
        "prefix-k16-walk512": dataclasses.replace(base, leaves_per_pass=16,
                                                  pallas_walk_envs=512),
        "prefix-wsel": dataclasses.replace(base, write_mode="select"),
        "prefix-weinsum": base,  # einsum writes are the measured default
        "prefix-k16-wsel": dataclasses.replace(base, leaves_per_pass=16,
                                               write_mode="select"),
        "prefix-k16-weinsum": dataclasses.replace(base, leaves_per_pass=16),
        "prefix-k16-gtake": dataclasses.replace(base, leaves_per_pass=16,
                                                gather_mode="take"),
        "prefix-gtake": dataclasses.replace(base, gather_mode="take"),
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
