"""Flagship single-chip probe: does the 9x9 512x4 32k-env TRAIN state fit and
step on one chip (the reference trains this on an 11GB 2080 Ti,
boardlaw/main.py:147)? Reports step time and samples/s.

Usage: python scripts/train_32k_probe.py [n_envs] [K] [grow]
"""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from boardlaw_tpu import train as T


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 32 * 1024
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    grow = len(sys.argv) > 3 and sys.argv[3] == "grow"
    cfg = T.TrainConfig(
        boardsize=9, width=512, depth=4, n_envs=n_envs,
        dtype="bfloat16", tree_dtype="bfloat16", leaves_per_pass=K,
        use_pallas=False if K > 1 else None,
        grow_passes=grow,
        mix_steps=64,  # cheap init; mixing length doesn't affect memory
    )
    model, opt, init, warmup, train_step = T.make_train(cfg)
    t0 = time.time()
    state = init(jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    print(f"init ok ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    state, aux = train_step(state)
    float(aux["loss.total"])  # host fetch: the only true sync on axon
    print(f"first step (compile) {time.time()-t0:.0f}s", flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, aux = train_step(state)
        float(aux["loss.total"])
        times.append(time.perf_counter() - t0)
    step_s = min(times)
    print(json.dumps({
        "n_envs": n_envs, "K": K, "step_s": round(step_s, 3),
        "samples_per_s": round(n_envs / step_s),
        "loss": float(aux["loss.total"]),
    }), flush=True)


if __name__ == "__main__":
    main()
