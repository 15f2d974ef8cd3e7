"""BASELINE config 5's single-chip half: does the 11x11 512x4 32k-env
flagship TRAIN step fit on one chip, and how fast is it? (r4 VERDICT
next-step #9; the reference quotes 11x11 MoHex benchmarks, mohex.py:328-340.)

Measures, host-fetch fenced (block_until_ready lies on this backend):
  - one full train_step (actor search + buffer + learner) at 11x11
  - the bare 64-node search at 16k envs for the sims/s row

Usage: python scripts/measure_11x11.py [train_envs] [search_envs]
"""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TRAIN_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 32 * 1024
SEARCH_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 16 * 1024
REPS = 3


def bench_search():
    from boardlaw_tpu.envs import hex
    from boardlaw_tpu.mcts import search, root
    from boardlaw_tpu.train import TrainConfig, build_model

    cfg = TrainConfig(boardsize=11, width=512, depth=4, n_nodes=64,
                      dtype="bfloat16", tree_dtype="bfloat16",
                      use_pallas=False, leaves_per_pass=8, grow_passes=True)
    model = build_model(cfg)
    world = hex.Hex.initial(SEARCH_ENVS, cfg.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)
    mcfg = cfg.mcts_config()

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    @jax.jit
    def full_search(world, key):
        tree = search.mcts(world, eval_fn, key, mcfg)
        return root(tree)["v"].sum()

    t0 = time.time()
    float(full_search(world, jax.random.PRNGKey(1)))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(REPS):
        t0 = time.perf_counter()
        float(full_search(world, jax.random.fold_in(jax.random.PRNGKey(2), i)))
        best = min(best, time.perf_counter() - t0)
    return {"search_s": round(best, 4),
            "sims_per_s": round(SEARCH_ENVS * (cfg.n_nodes - 1) / best),
            "compile_s": round(compile_s, 1), "n_envs": SEARCH_ENVS}


def bench_train_step():
    from boardlaw_tpu.train import TrainConfig, make_train

    cfg = TrainConfig(boardsize=11, width=512, depth=4, n_envs=TRAIN_ENVS,
                      dtype="bfloat16", tree_dtype="bfloat16",
                      use_pallas=False, leaves_per_pass=8, grow_passes=True)
    model, opt, init, warmup, train_step = make_train(cfg)
    t0 = time.time()
    state = init(jax.random.PRNGKey(0))
    state = warmup(state, chunk=8)
    state, aux = train_step(state)
    float(aux["loss.total"])  # host-fetch fence
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, aux = train_step(state)
        float(aux["loss.total"])
        best = min(best, time.perf_counter() - t0)
    return {"train_step_s": round(best, 4),
            "samples_per_s": round(TRAIN_ENVS / best),
            "compile_plus_warmup_s": round(compile_s, 1),
            "n_envs": TRAIN_ENVS}


def main():
    out = {"boardsize": 11, "net": "512x4", "k": 8}
    try:
        out["search"] = bench_search()
    except Exception as e:
        out["search"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    print(json.dumps(out), flush=True)
    try:
        out["train"] = bench_train_step()
    except Exception as e:
        out["train"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    print(json.dumps(out), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/measure_11x11.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
