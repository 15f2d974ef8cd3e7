"""Pallas kernel equivalence vs the XLA reference implementations, in
interpreter mode on CPU (the real-TPU path is exercised by bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boardlaw_tpu.mcts import search as S
from boardlaw_tpu.mcts import pallas_kernels as PK


def _random_tree(rng, B, T, A, Sn=2, c_puct=1.0):
    children = np.full((B, T, A), -1, np.int32)
    parents = np.full((B, T), -1, np.int32)
    relation = np.full((B, T), -1, np.int32)
    seats = rng.integers(0, Sn, (B, T)).astype(np.int32)
    terminal = np.zeros((B, T), bool)
    for b in range(B):
        for c in range(1, T):
            p = rng.integers(0, c)
            free = np.flatnonzero(children[b, p] == -1)
            if len(free) == 0:
                continue
            a = rng.choice(free)
            children[b, p, a] = c
            parents[b, c] = p
            relation[b, c] = a
            terminal[b, c] = rng.random() < 0.15

    logits = rng.normal(0, 1, (B, T, A)).astype(np.float32)
    logits -= np.log(np.exp(logits).sum(-1, keepdims=True))
    n = rng.integers(1, 20, (B, T)).astype(np.int32)
    w = rng.normal(0, 2, (B, T, Sn)).astype(np.float32)
    v = rng.normal(0, 1, (B, T, Sn)).astype(np.float32)
    rewards = rng.normal(0, 0.5, (B, T, Sn)).astype(np.float32)

    n_edge = np.zeros((B, T, A), np.float32)
    w_edge = np.zeros((B, T, A), np.float32)
    for b in range(B):
        for t in range(T):
            for a in range(A):
                c = children[b, t, a]
                if c > -1:
                    n_edge[b, t, a] = n[b, c]
                    w_edge[b, t, a] = w[b, c, seats[b, t]]

    return S.Tree(
        children=jnp.asarray(children), parents=jnp.asarray(parents),
        relation=jnp.asarray(relation), worlds=None,
        seats=jnp.asarray(seats), terminal=jnp.asarray(terminal),
        rewards=jnp.asarray(rewards), logits=jnp.asarray(logits),
        v=jnp.asarray(v), n=jnp.asarray(n), w=jnp.asarray(w),
        n_edge=jnp.asarray(n_edge), w_edge=jnp.asarray(w_edge),
        c_puct=jnp.full((B,), c_puct, jnp.float32), sim=jnp.array(T, jnp.int32),
    )


@pytest.mark.parametrize("seed,c_puct", [(0, 1.0), (1, 0.0625), (2, 10.0)])
def test_descend_matches_xla(seed, c_puct):
    rng = np.random.default_rng(seed)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A, c_puct=c_puct)
    rands = jax.random.uniform(jax.random.PRNGKey(seed), (B, T))

    p_xla, a_xla = S.descend(tree, rands)
    p_pal, a_pal = PK.descend(tree, rands, block_envs=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(p_xla), np.asarray(p_pal))
    np.testing.assert_array_equal(np.asarray(a_xla), np.asarray(a_pal))


@pytest.mark.parametrize("npv", [1, 2])
def test_backup_matches_xla(npv):
    rng = np.random.default_rng(3)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A)
    leaves = jnp.asarray(rng.integers(0, T, B), jnp.int32)

    out_xla = S.backup(tree, leaves, npv)
    out_pal = PK.backup(tree, leaves, npv, block_envs=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(out_xla.n), np.asarray(out_pal.n))
    np.testing.assert_allclose(np.asarray(out_xla.w), np.asarray(out_pal.w), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_xla.n_edge), np.asarray(out_pal.n_edge), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_xla.w_edge), np.asarray(out_pal.w_edge), atol=1e-5
    )


@pytest.mark.parametrize("npv", [1, 2])
def test_backup_dense_matches_xla(npv):
    rng = np.random.default_rng(5)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A)
    leaves = jnp.asarray(rng.integers(0, T, B), jnp.int32)

    out_xla = S.backup(tree, leaves, npv)
    out_pal = PK.backup_dense(tree, leaves, npv, block_envs=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(out_xla.n), np.asarray(out_pal.n))
    np.testing.assert_allclose(np.asarray(out_xla.w), np.asarray(out_pal.w), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_xla.n_edge), np.asarray(out_pal.n_edge), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_xla.w_edge), np.asarray(out_pal.w_edge), atol=1e-5
    )


@pytest.mark.parametrize("seed,c_puct", [(0, 1.0), (1, 0.0625)])
def test_node_actions_matches_xla(seed, c_puct):
    rng = np.random.default_rng(seed)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A, c_puct=c_puct)
    rands = jax.random.uniform(jax.random.PRNGKey(seed), (B, T))
    qb = S._q_bounds(tree)

    a_xla, c_xla = S.node_actions(tree, rands, qb)
    a_pal, c_pal = PK.node_actions(tree, rands, qb, block_envs=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(a_xla), np.asarray(a_pal))
    np.testing.assert_array_equal(np.asarray(c_xla), np.asarray(c_pal))


def test_descend_pallas_nodes_cfg():
    # descend(cfg with pallas_nodes='interpret') routes through the kernel and
    # stays bit-identical to the pure-XLA path
    rng = np.random.default_rng(5)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A)
    rands = jax.random.uniform(jax.random.PRNGKey(5), (B, T))
    cfg = S.MCTSConfig(pallas_nodes="interpret", pallas_nodes_envs=8)

    p_xla, a_xla = S.descend(tree, rands)
    p_pal, a_pal = S.descend(tree, rands, cfg)
    np.testing.assert_array_equal(np.asarray(p_xla), np.asarray(p_pal))
    np.testing.assert_array_equal(np.asarray(a_xla), np.asarray(a_pal))


def test_walk_kernel_matches_xla():
    # the Pallas pointer-chase kernel is pure integer logic and must be
    # bit-identical to search._walk on the same acts/nxt
    rng = np.random.default_rng(3)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A)
    rands = jax.random.uniform(jax.random.PRNGKey(3), (B, T))
    qb = S._q_bounds(tree)
    acts, nxt = S.node_actions(tree, rands, qb)

    halt = S._halt_of(tree, nxt)
    p_x, a_x, c_x, path_x = S._walk(acts, nxt, halt, tree.terminal[:, 0])
    p_p, a_p, c_p, path_p = PK.walk(tree.terminal, acts, nxt, block_envs=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(p_x), np.asarray(p_p))
    np.testing.assert_array_equal(np.asarray(a_x), np.asarray(a_p))
    np.testing.assert_array_equal(np.asarray(c_x), np.asarray(c_p))
    np.testing.assert_array_equal(np.asarray(path_x), np.asarray(path_p))


@pytest.mark.parametrize("seed,c_puct", [(0, 1.0), (2, 0.0625)])
def test_node_actions_multi_matches_xla(seed, c_puct):
    # the K-sample solve+sample kernel vs node_probs + _sample_children_multi
    # (both use the log-shift prefix sum, so equality is bitwise)
    rng = np.random.default_rng(seed)
    B, T, A, K = 16, 12, 7, 4
    tree = _random_tree(rng, B, T, A, c_puct=c_puct)
    rands = jax.random.uniform(jax.random.PRNGKey(seed), (K, B, T))
    qb = S._q_bounds(tree)

    probs = S.node_probs(tree, qb)
    a_xla, c_xla = S._sample_children_multi(tree, probs, rands, cum_mode="shift")  # (K,B,T)

    a_pal, c_pal = PK.node_actions_multi(
        tree, jnp.moveaxis(rands, 0, 1), qb, block_envs=8, interpret=True
    )  # (B,K,T)

    np.testing.assert_array_equal(
        np.asarray(a_xla), np.asarray(jnp.moveaxis(a_pal, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(c_xla), np.asarray(jnp.moveaxis(c_pal, 1, 0)))


def test_simulate_multi_pallas_nodes_cfg():
    # simulate_multi(cfg with pallas_nodes='interpret') routes the solve+
    # sample through the K-kernel; tree statistics must match the XLA path
    from boardlaw_tpu.envs import hex, validation

    world = hex.Hex.initial(n_envs=8, boardsize=5)
    agent = validation.RandomAgent()
    # production solver defaults on BOTH sides: the kernel implements the
    # same safeguarded-Halley rule, so the paths stay in lockstep
    cfg_x = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         warm_solve=False, sample_cum="shift")
    cfg_p = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         warm_solve=False, pallas_nodes="interpret",
                         pallas_nodes_envs=8, pallas_walk=False)
    key = jax.random.PRNGKey(7)

    t_x = S.mcts(world, agent, key, cfg_x)
    t_p = S.mcts(world, agent, key, cfg_p)

    np.testing.assert_array_equal(np.asarray(t_x.children), np.asarray(t_p.children))
    np.testing.assert_array_equal(np.asarray(t_x.n), np.asarray(t_p.n))
    np.testing.assert_allclose(
        np.asarray(t_x.w, np.float32), np.asarray(t_p.w, np.float32), atol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_sample_children_kernel_matches_xla(seed):
    # the sampler-only kernel vs _sample_children_multi on shared solved
    # probs: bitwise equal (same log-shift prefix sum, same masked-iota
    # selects)
    rng = np.random.default_rng(seed)
    B, T, A, K = 16, 12, 7, 4
    tree = _random_tree(rng, B, T, A)
    rands = jax.random.uniform(jax.random.PRNGKey(seed), (K, B, T))
    probs = S.node_probs(tree, S._q_bounds(tree))

    a_xla, c_xla = S._sample_children_multi(tree, probs, rands, cum_mode="shift")
    a_pal, c_pal = PK.sample_children_multi(
        probs, tree.children, jnp.moveaxis(rands, 0, 1), block_envs=8,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(a_xla), np.asarray(jnp.moveaxis(a_pal, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(c_xla), np.asarray(jnp.moveaxis(c_pal, 1, 0)))


def test_simulate_multi_pallas_sample_cfg():
    # simulate_multi(cfg with pallas_sample='interpret') routes sampling
    # through the kernel; tree statistics must match the XLA path
    from boardlaw_tpu.envs import hex, validation

    world = hex.Hex.initial(n_envs=8, boardsize=5)
    agent = validation.RandomAgent()
    cfg_x = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         pallas_sample=False, sample_cum="shift")
    cfg_p = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         pallas_sample="interpret", pallas_sample_envs=8,
                         pallas_walk=False)
    key = jax.random.PRNGKey(7)

    t_x = S.mcts(world, agent, key, cfg_x)
    t_p = S.mcts(world, agent, key, cfg_p)

    np.testing.assert_array_equal(np.asarray(t_x.children), np.asarray(t_p.children))
    np.testing.assert_array_equal(np.asarray(t_x.n), np.asarray(t_p.n))
    np.testing.assert_allclose(
        np.asarray(t_x.w, np.float32), np.asarray(t_p.w, np.float32), atol=1e-5)


@pytest.mark.parametrize("accel,n_iters", [(True, 6), (False, 16)])
def test_node_actions_multi_accel_matches_xla(accel, n_iters):
    # the kernel's solver rule tracks search.solve_policy under both the
    # accelerated and the reference formulation
    rng = np.random.default_rng(9)
    B, T, A, K = 16, 12, 7, 4
    tree = _random_tree(rng, B, T, A)
    rands = jax.random.uniform(jax.random.PRNGKey(9), (K, B, T))
    qb = S._q_bounds(tree)

    probs = S.node_probs(tree, qb, n_iters=n_iters, accel=accel)
    a_xla, c_xla = S._sample_children_multi(tree, probs, rands, cum_mode="shift")

    a_pal, c_pal = PK.node_actions_multi(
        tree, jnp.moveaxis(rands, 0, 1), qb, block_envs=8, interpret=True,
        n_iters=n_iters, accel=accel,
    )
    np.testing.assert_array_equal(
        np.asarray(a_xla), np.asarray(jnp.moveaxis(a_pal, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(c_xla), np.asarray(jnp.moveaxis(c_pal, 1, 0)))


@pytest.mark.parametrize("accel,n_iters", [(True, 6), (False, 16)])
def test_solve_probs_matches_xla(accel, n_iters):
    # the solve-only rows kernel vs node_probs: identical formulation, so
    # interpret mode matches to f32 roundoff
    rng = np.random.default_rng(4)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A, c_puct=0.0625)
    qb = S._q_bounds(tree)

    probs_x = S.node_probs(tree, qb, n_iters=n_iters, accel=accel)
    probs_p = PK.solve_probs(tree, qb, n_iters=n_iters, accel=accel,
                             block_rows=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(probs_x), np.asarray(probs_p), rtol=1e-6, atol=1e-7)


def test_solve_probs_auto_block():
    # block_rows=None picks the largest power-of-two divisor of B*T
    rng = np.random.default_rng(5)
    B, T, A = 16, 12, 7  # rows = 192 -> 64
    tree = _random_tree(rng, B, T, A)
    qb = S._q_bounds(tree)
    probs_x = S.node_probs(tree, qb, n_iters=6, accel=True)
    probs_p = PK.solve_probs(tree, qb, n_iters=6, accel=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(probs_x), np.asarray(probs_p), rtol=1e-6, atol=1e-7)


def test_simulate_multi_pallas_solve_cfg():
    # simulate_multi(cfg with pallas_solve='interpret') routes the all-node
    # solve through the rows kernel; tree statistics must match the XLA path
    # (compact tree active at this size, so the kernel streams bf16 n_edge)
    from boardlaw_tpu.envs import hex, validation

    world = hex.Hex.initial(n_envs=8, boardsize=5)
    agent = validation.RandomAgent()
    cfg_x = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         pallas_solve=False)
    cfg_p = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         pallas_solve="interpret", pallas_walk=False)
    key = jax.random.PRNGKey(7)

    t_x = S.mcts(world, agent, key, cfg_x)
    t_p = S.mcts(world, agent, key, cfg_p)

    np.testing.assert_array_equal(np.asarray(t_x.children), np.asarray(t_p.children))
    np.testing.assert_array_equal(np.asarray(t_x.n), np.asarray(t_p.n))
    np.testing.assert_allclose(
        np.asarray(t_x.w, np.float32), np.asarray(t_p.w, np.float32), atol=1e-5)


def test_grow_passes_pallas_walk_padded():
    # grow mode + the Pallas walk: inputs pad to the full T so one kernel
    # shape serves every pass — results must match the XLA-walk grow path
    from boardlaw_tpu.envs import hex, validation

    world = hex.Hex.initial(n_envs=8, boardsize=5)
    agent = validation.RandomAgent()
    cfg_x = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         grow_passes=True, pallas_walk=False)
    cfg_p = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                         grow_passes=True, pallas_walk="interpret",
                         pallas_walk_envs=8)
    key = jax.random.PRNGKey(11)

    t_x = S.mcts(world, agent, key, cfg_x)
    t_p = S.mcts(world, agent, key, cfg_p)

    np.testing.assert_array_equal(np.asarray(t_x.children), np.asarray(t_p.children))
    np.testing.assert_array_equal(np.asarray(t_x.n), np.asarray(t_p.n))
    np.testing.assert_allclose(
        np.asarray(t_x.w, np.float32), np.asarray(t_p.w, np.float32), atol=1e-5)


def test_solve_alpha_mode_matches_probs_mode():
    # out="alpha" returns only the converged Newton roots; feeding them back
    # through node_probs(fixed_alpha=...) must reproduce the probs-mode
    # kernel (and the XLA solve) to f32 roundoff
    rng = np.random.default_rng(6)
    B, T, A = 16, 12, 7
    tree = _random_tree(rng, B, T, A, c_puct=0.0625)
    qb = S._q_bounds(tree)

    probs_x = S.node_probs(tree, qb, n_iters=6, accel=True)
    alpha = PK.solve_probs(tree, qb, n_iters=6, accel=True,
                           block_rows=16, interpret=True, out="alpha")
    assert alpha.shape == (B, T)
    probs_a = S.node_probs(tree, qb, fixed_alpha=alpha)
    np.testing.assert_allclose(
        np.asarray(probs_x), np.asarray(probs_a), rtol=1e-6, atol=1e-7)


def test_simulate_multi_alpha_solve_cfg():
    # pallas_solve='alpha_interpret' routes through the alpha-only kernel +
    # XLA probs; tree statistics must match the XLA-solve path, including
    # under grow passes (per-R kernel variants)
    from boardlaw_tpu.envs import hex, validation

    world = hex.Hex.initial(n_envs=8, boardsize=5)
    agent = validation.RandomAgent()
    key = jax.random.PRNGKey(7)
    for grow in (False, True):
        cfg_x = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                             pallas_solve=False, grow_passes=grow)
        cfg_a = S.MCTSConfig(n_nodes=13, leaves_per_pass=4, use_pallas=False,
                             pallas_solve="alpha_interpret", pallas_walk=False,
                             grow_passes=grow)
        t_x = S.mcts(world, agent, key, cfg_x)
        t_a = S.mcts(world, agent, key, cfg_a)
        np.testing.assert_array_equal(
            np.asarray(t_x.children), np.asarray(t_a.children))
        np.testing.assert_array_equal(np.asarray(t_x.n), np.asarray(t_a.n))
        np.testing.assert_allclose(
            np.asarray(t_x.w, np.float32), np.asarray(t_a.w, np.float32),
            atol=1e-5)
