"""Round-2b chip sweep at flagship shapes (16k envs, 9x9, 512x4 bf16, K=8):
the matmul-cum sampler vs the log-shift one, the warm-3 solve default vs
accel-6, per-pass convergence (|err|>=tol frac) under the warm-3 default,
and the end-to-end search rate. JSON lines to stdout as results land."""
import sys, os, time, json, dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search
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
    print(json.dumps({"name": "tree_built", "n_envs": B, "K": K,
                      "defaults": "warm3+matmul"}), flush=True)
    T = tree.terminal.shape[-1]

    # --- sampler formulations on shared solved probs ---
    probs = jax.jit(lambda t: search.node_probs(t, search._q_bounds(t)))(tree)
    jax.block_until_ready(probs)
    rands = jax.random.uniform(jax.random.PRNGKey(7), (K, B, T))

    def sampler(mode):
        @jax.jit
        def f(tree, probs, rands):
            return search._sample_children_multi(tree, probs, rands, cum_mode=mode)
        return f

    a_m, _ = timed("sample xla matmul", sampler("matmul"), tree, probs, rands)
    a_s, _ = timed("sample xla shift", sampler("shift"), tree, probs, rands)
    if a_m is not None and a_s is not None:
        match = float(jnp.mean((a_m[0] == a_s[0]).astype(jnp.float32)))
        print(json.dumps({"name": "matmul/shift action agreement", "value": match}),
              flush=True)

    # --- full passes under config variants ---
    def passes_fn(cfg2):
        m2 = cfg2.mcts_config()

        @jax.jit
        def f(tree, key):
            def body(tree, k):
                return search.simulate_multi(tree, eval_fn, k, m2), None
            tree, _ = jax.lax.scan(body, tree, jax.random.split(key, 4))
            return tree.n
        return f

    _, ms_pass = timed("4 passes (default: warm3+matmul)", passes_fn(cfg), tree,
                       jax.random.PRNGKey(3))
    if ms_pass:
        print(json.dumps({"name": "sims_per_s (pass-rate)",
                          "value": round(4 * K * B / (ms_pass / 1e3))}), flush=True)
    timed("4 passes (accel6+matmul)", passes_fn(dataclasses.replace(
        cfg, warm_solve=False, solve_iters=6)), tree, jax.random.PRNGKey(3))
    timed("4 passes (warm3+shift)", passes_fn(dataclasses.replace(
        cfg, sample_cum="shift")), tree, jax.random.PRNGKey(3))

    # --- warm-3 convergence: replicate the in-pass solve before each pass
    # and measure the |err|>=tol fraction (the contract solve_policy claims)
    mc = cfg.mcts_config()

    @jax.jit
    def one_pass(tree, key):
        return search.simulate_multi(tree, eval_fn, key, mc)

    @jax.jit
    def err_frac(tree):
        p, _ = search.node_probs(tree, search._q_bounds(tree),
                                 warm_alpha=tree.alpha, n_iters=3, accel=True,
                                 return_alpha=True)
        return jnp.mean((jnp.abs(p.sum(-1) - 1.0) >= 1e-3).astype(jnp.float32))

    t2 = build_tree(world, jax.random.PRNGKey(11))
    fracs = []
    for i in range(4):
        fracs.append(float(err_frac(t2)))
        t2 = one_pass(t2, jax.random.PRNGKey(100 + i))
    print(json.dumps({"name": "warm3 |err|>=tol frac per pass", "value": fracs}),
          flush=True)

    # --- end-to-end search rate under the new defaults ---
    @jax.jit
    def full_search(world, key):
        return search.root(search.mcts(world, eval_fn, key, mcfg))["logits"]

    _, ms_full = timed("full 64-node search", full_search, world,
                       jax.random.PRNGKey(9))
    if ms_full:
        print(json.dumps({"name": "mcts_sims_per_s",
                          "value": round(B * 63 / (ms_full / 1e3))}), flush=True)


if __name__ == "__main__":
    main()
