"""One-process round-2 measurement sweep at flagship shapes (16k envs, 9x9,
512x4 bf16, K=8): solve variants, sampler variants, full multi-leaf pass,
sims/s. Writes JSON lines to stdout as results land (robust to timeouts)."""
import sys, os, time, json, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search, pallas_kernels
from boardlaw_tpu.train import TrainConfig, build_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024
K = 8
REPS = 5


def timed(name, fn, *args, **meta):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3), **meta}), flush=True)
        return out, ms
    except Exception as e:
        print(json.dumps({"name": name, "error": f"{type(e).__name__}: {str(e)[:160]}"}),
              flush=True)
        return None, None


def main():
    cfg = TrainConfig(boardsize=9, width=512, depth=4, n_nodes=64,
                      dtype="bfloat16", tree_dtype="bfloat16", use_pallas=False,
                      leaves_per_pass=K)
    mcfg = cfg.mcts_config()
    model = build_model(cfg)
    world = hex.Hex.initial(B, cfg.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    @jax.jit
    def build_tree(world, key):
        k_init, k_sims = jax.random.split(key)
        tree = search.build(world, mcfg)
        tree = search.initialize(tree, eval_fn(world, None), k_init, mcfg, world.valid)

        def body(tree, k):
            return search.simulate_multi(tree, eval_fn, k, mcfg), None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(k_sims, 3))
        return tree

    tree = build_tree(world, jax.random.PRNGKey(1))
    jax.block_until_ready(tree.n)
    print(json.dumps({"name": "tree_built", "n_envs": B, "K": K}), flush=True)

    T = tree.terminal.shape[-1]

    # --- solve variants ---
    def solve_fn(n_iters, accel):
        @jax.jit
        def f(tree):
            return search.node_probs(tree, search._q_bounds(tree),
                                     n_iters=n_iters, accel=accel)
        return f

    timed("solve newton16", solve_fn(16, False), tree)
    _, ms_accel = timed("solve accel6", solve_fn(6, True), tree)
    timed("solve accel4", solve_fn(4, True), tree)

    # verify the accelerated solve meets tolerance on the real tree
    probs6 = solve_fn(6, True)(tree)
    s = probs6.sum(-1)
    frac_bad = float(jnp.mean((jnp.abs(s - 1.0) >= 1e-3).astype(jnp.float32)))
    print(json.dumps({"name": "accel6 |err|>=tol frac", "value": frac_bad}), flush=True)

    # --- sampler variants (probs precomputed) ---
    probs = jax.jit(lambda t: search.node_probs(t, search._q_bounds(t)))(tree)
    jax.block_until_ready(probs)
    rands_kbt = jax.random.uniform(jax.random.PRNGKey(7), (K, B, T))
    rands_bkt = jnp.moveaxis(rands_kbt, 0, 1)

    @jax.jit
    def xla_sample(tree, probs, rands):
        return search._sample_children_multi(tree, probs, rands)

    a, _ = timed("sample xla", xla_sample, tree, probs, rands_kbt)

    def pallas_sample(block):
        @jax.jit
        def f(tree, probs, rands):
            return pallas_kernels.sample_children_multi(
                probs, tree.children, rands, block_envs=block)
        return f

    c, _ = timed("sample pallas b64", pallas_sample(64), tree, probs, rands_bkt)
    if a is not None and c is not None:
        match = float(jnp.mean((jnp.moveaxis(c[0], 1, 0) == a[0]).astype(jnp.float32)))
        print(json.dumps({"name": "pallas sampler match", "value": match}), flush=True)

    # --- full pass with production defaults (accel solve, XLA sampler) ---
    def passes_fn(cfg2):
        m2 = cfg2.mcts_config()

        @jax.jit
        def f(tree, key):
            def body(tree, k):
                return search.simulate_multi(tree, eval_fn, k, m2), None
            tree, _ = jax.lax.scan(body, tree, jax.random.split(key, 4))
            return tree.n
        return f

    import dataclasses
    _, ms_pass = timed("4 passes (default: accel6)", passes_fn(cfg), tree,
                       jax.random.PRNGKey(3))
    if ms_pass:
        sims = 4 * K * B / (ms_pass / 1e3)
        print(json.dumps({"name": "sims_per_s (pass-rate)", "value": round(sims)}),
              flush=True)
    cfg_old = dataclasses.replace(cfg, solve_iters=16, solve_accel=False)
    timed("4 passes (newton16)", passes_fn(cfg_old), tree, jax.random.PRNGKey(3))
    cfg_ps = dataclasses.replace(cfg, pallas_sample=True)
    timed("4 passes (accel6+pallas sampler)", passes_fn(cfg_ps), tree,
          jax.random.PRNGKey(3))
    cfg_warm = dataclasses.replace(cfg, warm_solve=True, solve_iters=3)
    timed("4 passes (warm accel3)", passes_fn(cfg_warm), tree, jax.random.PRNGKey(3))

    # --- end-to-end search rate (fresh tree each step, like bench.py) ---
    @jax.jit
    def full_search(world, key):
        r = search.root(search.mcts(world, eval_fn, key, mcfg))
        return r["logits"]

    _, ms_full = timed("full 64-node search", full_search, world,
                       jax.random.PRNGKey(9))
    if ms_full:
        print(json.dumps({"name": "mcts_sims_per_s",
                          "value": round(B * 63 / (ms_full / 1e3))}), flush=True)


if __name__ == "__main__":
    main()
