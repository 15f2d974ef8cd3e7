"""Isolate the multi-leaf solve+sample stage at flagship shapes and compare:
  a) the current XLA pair (node_probs + _sample_children_multi)
  b) the XLA pair with lampi/q materialized via optimization_barrier
     (hypothesis: XLA remats exp(logits) + the q divide into every Newton
     iteration fusion -> transcendental-bound at ~2.6ms/iter)
  c) the Pallas node_actions_multi kernel at several block sizes
"""
import sys, os, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search
from boardlaw_tpu.mcts import pallas_kernels
from boardlaw_tpu.train import TrainConfig, build_model

B = 16 * 1024
K = 8
REPS = 5


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(times)*1e3:9.3f} ms", flush=True)
    return out


def solve_policy_barrier(pi, q, lambda_n, n_iters=16, tol=1e-3):
    """search.solve_policy with lampi/q materialized before the Newton loop
    so each iteration fusion reads f32 arrays instead of recomputing
    exp/divide from the bf16 sources."""
    lam = lambda_n[:, None].astype(jnp.float32)
    pi = pi.astype(jnp.float32)
    q = q.astype(jnp.float32)

    lampi = lam * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, -1)
    floor = jnp.max(q, -1) + 1e-6
    lampi, q, alpha, floor = jax.lax.optimization_barrier((lampi, q, alpha, floor))
    done = jnp.zeros(alpha.shape, bool)

    for _ in range(n_iters):
        r = 1.0 / (alpha[:, None] - q)
        terms = lampi * r
        s = terms.sum(-1)
        g = -(terms * r).sum(-1)
        err = s - 1.0
        done = done | (err < tol)
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, err / g), floor)

    return lampi / (alpha[:, None] - q)


def node_probs_variant(tree, q_bounds, solver):
    Bt, T, A = tree.children.shape
    lo, hi = q_bounds
    logits = tree.logits.astype(jnp.float32)
    ne = tree.n_edge.astype(jnp.float32)
    we = tree.w_edge.astype(jnp.float32)
    expanded = ne > 0
    q = jnp.where(expanded, (we / (ne + 1e-4) - lo) / (hi - lo + 1e-4), 0.0)
    counts = jnp.where(expanded, ne, 1.0)
    pi = jnp.exp(logits)
    N = counts.sum(-1)
    lam = tree.c_puct[:, None] * N / (N + A)
    return solver(pi.reshape(Bt * T, A), q.reshape(Bt * T, A),
                  lam.reshape(Bt * T)).reshape(Bt, T, A)


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
    print("tree built", flush=True)

    T = tree.terminal.shape[-1]
    rands_kbt = jax.random.uniform(jax.random.PRNGKey(7), (K, B, T))
    rands_bkt = jnp.moveaxis(rands_kbt, 0, 1)

    @jax.jit
    def xla_pair(tree, rands):
        qb = search._q_bounds(tree)
        probs = node_probs_variant(tree, qb, search.solve_policy)
        return search._sample_children_multi(tree, probs, rands)

    @jax.jit
    def xla_pair_barrier(tree, rands):
        qb = search._q_bounds(tree)
        probs = node_probs_variant(tree, qb, solve_policy_barrier)
        return search._sample_children_multi(tree, probs, rands)

    @jax.jit
    def solve_only(tree):
        qb = search._q_bounds(tree)
        return node_probs_variant(tree, qb, search.solve_policy)

    @jax.jit
    def solve_only_barrier(tree):
        qb = search._q_bounds(tree)
        return node_probs_variant(tree, qb, solve_policy_barrier)

    def pallas_multi(block):
        @jax.jit
        def f(tree, rands):
            qb = search._q_bounds(tree)
            return pallas_kernels.node_actions_multi(tree, rands, qb,
                                                     block_envs=block)
        return f

    a = timed("xla pair (current)", xla_pair, tree, rands_kbt)
    timed("solve only (current)", solve_only, tree)
    timed("solve only (barrier)", solve_only_barrier, tree)
    b = timed("xla pair (barrier)", xla_pair_barrier, tree, rands_kbt)
    agree = bool(jnp.mean((a[0] == b[0]).astype(jnp.float32)) > 0.999)
    print(f"barrier actions match: {agree}")
    for block in (16, 128, 512):
        try:
            c = timed(f"pallas multi block={block}", pallas_multi(block), tree, rands_bkt)
            match = float(jnp.mean((jnp.moveaxis(c[0], 1, 0) == a[0]).astype(jnp.float32)))
            print(f"  action match vs xla: {match:.4f}")
        except Exception as e:
            print(f"pallas block={block} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
