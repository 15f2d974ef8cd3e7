"""How many solve iterations does a REAL flagship-shape tree need?

Reports the done-fraction (err < tol) after each iteration for:
  - cold Newton (the current production solve, 16 unrolled iters)
  - cold Halley (3rd-order; one extra multiply+reduce per iter)
  - warm Newton (init from the previous pass's converged alpha, the
    `Tree.alpha` warm-start idea)
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search
from boardlaw_tpu.train import TrainConfig, build_model

B, K, N_IT = 16 * 1024, 8, 24


def inputs_of(tree):
    Bt, T, A = tree.children.shape
    lo, hi = search._q_bounds(tree)
    logits = tree.logits.astype(jnp.float32)
    ne = tree.n_edge.astype(jnp.float32)
    we = tree.w_edge.astype(jnp.float32)
    expanded = ne > 0
    q = jnp.where(expanded, (we / (ne + 1e-4) - lo) / (hi - lo + 1e-4), 0.0)
    counts = jnp.where(expanded, ne, 1.0)
    pi = jnp.exp(logits)
    N = counts.sum(-1)
    lam = tree.c_puct[:, None] * N / (N + A)
    E = Bt * T
    return pi.reshape(E, A), q.reshape(E, A), lam.reshape(E)


def newton_trace(pi, q, lam, warm_alpha=None, tol=1e-3):
    lampi = lam[:, None] * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, -1)
    floor = jnp.max(q, -1) + 1e-6
    if warm_alpha is not None:
        # keep the warm init only where it's still strictly below the root
        # (s(warm) > 1): elsewhere fall back to the cold init
        s_w = (lampi / (warm_alpha[:, None] - q)).sum(-1)
        ok = (warm_alpha > floor) & (s_w > 1.0)
        alpha = jnp.where(ok, jnp.maximum(warm_alpha, alpha), alpha)
    done = jnp.zeros(alpha.shape, bool)
    fracs = []
    for _ in range(N_IT):
        r = 1.0 / (alpha[:, None] - q)
        terms = lampi * r
        s = terms.sum(-1)
        g = -(terms * r).sum(-1)
        err = s - 1.0
        done = done | (err < tol)
        fracs.append(done.mean())
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, err / g), floor)
    return jnp.stack(fracs), alpha


def halley_trace(pi, q, lam, tol=1e-3):
    lampi = lam[:, None] * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, -1)
    floor = jnp.max(q, -1) + 1e-6
    done = jnp.zeros(alpha.shape, bool)
    fracs = []
    for _ in range(N_IT):
        r = 1.0 / (alpha[:, None] - q)
        terms = lampi * r
        s = terms.sum(-1)
        g = -(terms * r).sum(-1)      # s'
        h = 2.0 * (terms * r * r).sum(-1)  # s''
        err = s - 1.0
        done = done | (err < tol)
        fracs.append(done.mean())
        # Halley: x - 2 f f' / (2 f'^2 - f f'')
        step = 2.0 * err * g / (2.0 * g * g - err * h)
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, step), floor)
    return jnp.stack(fracs), alpha


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

    @jax.jit
    def probe(tree, key):
        """Advance 4 more passes; per pass, trace cold/halley/warm done
        fractions (warm from the previous pass's converged alpha). Returns
        per-iteration fractions averaged over passes."""
        pi, q, lam = inputs_of(tree)
        _, alpha_prev = newton_trace(pi, q, lam)

        def body(carry, k):
            tree, alpha_prev = carry
            tree = search.simulate_multi(tree, eval_fn, k, mcfg)
            pi, q, lam = inputs_of(tree)
            cold, alpha_star = newton_trace(pi, q, lam)
            hall, _ = halley_trace(pi, q, lam)
            warm, _ = newton_trace(pi, q, lam, warm_alpha=alpha_prev)
            return (tree, alpha_star), (cold, hall, warm)

        (_, _), (cold, hall, warm) = jax.lax.scan(
            body, (tree, alpha_prev), jax.random.split(key, 4))
        return cold.mean(0), hall.mean(0), warm.mean(0)

    tree = build_tree(world, jax.random.PRNGKey(1))
    jax.block_until_ready(tree.n)
    cold, hall, warm = jax.device_get(probe(tree, jax.random.PRNGKey(2)))
    for name, f in [("cold newton", cold), ("cold halley", hall),
                    ("warm newton(prev-pass alpha)", warm)]:
        print(name + ":")
        print("  " + " ".join(f"{x:.4f}" for x in f), flush=True)


if __name__ == "__main__":
    main()
