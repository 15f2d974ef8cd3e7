"""Round-2c chip sweep at flagship shapes (16k envs, 9x9, 512x4 bf16, K=8):
(a) warm-solve iteration count 3/4/5 — pass time and per-pass unconverged
fraction (round2b measured warm-3 leaving 15-20% of rows |err|>=tol);
(b) the depth-capped XLA walk (L_cap=n_passes+1 unrolled levels) vs the
early-exit Pallas walk kernel. JSON lines to stdout as results land."""
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

    def make_build_tree(m):
        @jax.jit
        def build_tree(world, key):
            k_init, k_sims = jax.random.split(key)
            tree = search.build(world, m)
            tree = search.initialize(tree, eval_fn(world, None), k_init, m, world.valid)

            def body(tree, k):
                return search.simulate_multi(tree, eval_fn, k, m), None

            tree, _ = jax.lax.scan(body, tree, jax.random.split(k_sims, 3))
            return tree

        return build_tree

    build_tree = make_build_tree(mcfg)
    tree = build_tree(world, jax.random.PRNGKey(1))
    jax.block_until_ready(tree.n)
    print(json.dumps({"name": "tree_built", "n_envs": B, "K": K}), flush=True)

    def passes_fn(cfg2, n=4):
        m2 = cfg2.mcts_config()

        @jax.jit
        def f(tree, key):
            def body(tree, k):
                return search.simulate_multi(tree, eval_fn, k, m2), None
            tree, _ = jax.lax.scan(body, tree, jax.random.split(key, n))
            return tree.n
        return f

    # (a) warm iteration ladder: time + convergence. warm_solve must be set
    # on the config (TrainConfig defaults it False since round 2) and the
    # probe tree built UNDER that config so tree.alpha exists — otherwise
    # both the timing and err_frac silently measure cold solves (ADVICE r2).
    for iters in (3, 4, 5):
        c2 = dataclasses.replace(cfg, warm_solve=True, solve_iters=iters)
        warm_tree = make_build_tree(c2.mcts_config())(world, jax.random.PRNGKey(1))
        assert warm_tree.alpha is not None, "warm probe tree lost its alpha"
        _, ms = timed(f"4 passes warm{iters}", passes_fn(c2), warm_tree,
                      jax.random.PRNGKey(3))
        if ms:
            print(json.dumps({"name": f"sims_per_s warm{iters}",
                              "value": round(4 * K * B / (ms / 1e3))}), flush=True)

        m2 = c2.mcts_config()

        @jax.jit
        def one_pass(tree, key, m2=m2):
            return search.simulate_multi(tree, eval_fn, key, m2)

        @jax.jit
        def err_frac(tree, iters=iters):
            p, _ = search.node_probs(tree, search._q_bounds(tree),
                                     warm_alpha=tree.alpha, n_iters=iters,
                                     accel=True, return_alpha=True)
            # fraction of LIVE rows (allocated, non-terminal) unconverged —
            # averaging over all (B,T) slots would dilute with empty rows
            T = tree.n.shape[1]
            live = (jnp.arange(T)[None, :] < tree.sim) & ~tree.terminal
            bad = (jnp.abs(p.sum(-1) - 1.0) >= 1e-3) & live
            return bad.sum() / jnp.maximum(live.sum(), 1)

        t2 = make_build_tree(m2)(world, jax.random.PRNGKey(11))
        fracs = []
        for i in range(4):
            fracs.append(round(float(err_frac(t2)), 5))
            t2 = one_pass(t2, jax.random.PRNGKey(100 + i))
        print(json.dumps({"name": f"warm{iters} |err|>=tol frac per pass (live rows)",
                          "value": fracs}), flush=True)

    # (b) walk variants under the warm-3 default
    timed("4 passes xla-capped-walk", passes_fn(dataclasses.replace(
        cfg, pallas_walk=False)), tree, jax.random.PRNGKey(3))
    timed("4 passes pallas-walk (default)", passes_fn(cfg), tree,
          jax.random.PRNGKey(3))

    # end-to-end with the better warm count is re-measured by bench.py


if __name__ == "__main__":
    main()
