"""MCTS tests — ports of the reference suite (boardlaw/mcts/tests.py).

Strategy (SURVEY.md §4.1-4.2): hand-built tiny trees fed straight to the
descend/root/backup primitives with *stochastic assertions* (empirical action
distributions over 1024 replicated envs vs analytic probabilities, 3-sigma
binomial CIs), plus full searches on synthetic games with planted exact
values via ProxyAgent.
"""
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boardlaw_tpu import mcts as M
from boardlaw_tpu.envs import hex, validation


def make_tree(logits, w, n, c_puct, seats, terminal, children, n_envs=1024):
    """Build a Tree whose per-node arrays are the given (T, ...) tensors
    replicated across n_envs (mirrors the reference's
    `data.cuda()[None].repeat_interleave(1024, 0)` pattern)."""
    logits = np.asarray(logits, np.float32)
    T, A = logits.shape
    w = np.asarray(w, np.float32)
    S = w.shape[-1]
    n = np.asarray(n, np.int64)
    children = np.asarray(children, np.int32)
    seats = np.asarray(seats, np.int32)

    # Edge stats mirror the node stats of each edge's child (see Tree docs)
    n_edge = np.zeros((T, A), np.float32)
    w_edge = np.zeros((T, A), np.float32)
    for t in range(T):
        for a in range(A):
            c = children[t, a]
            if c > -1:
                n_edge[t, a] = n[c]
                w_edge[t, a] = w[c, seats[t]]

    def rep(x):
        x = jnp.asarray(x)
        return jnp.broadcast_to(x[None], (n_envs,) + x.shape)

    # parents/relation/worlds/rewards/v unused by descend/root
    return M.Tree(
        children=rep(children),
        parents=rep(np.full((T,), -1, np.int32)),
        relation=rep(np.full((T,), -1, np.int32)),
        worlds=None,
        seats=rep(seats),
        terminal=rep(np.asarray(terminal, bool)),
        rewards=rep(np.zeros((T, S), np.float32)),
        logits=rep(logits),
        v=rep(np.zeros((T, S), np.float32)),
        n=rep(n.astype(np.int32)),
        w=rep(w),
        n_edge=rep(n_edge),
        w_edge=rep(w_edge),
        c_puct=jnp.full((n_envs,), c_puct, jnp.float32),
        sim=jnp.array(T, jnp.int32),
    )


def assert_distribution(xs, freqs):
    # reference mcts/tests.py:28-32
    xs = np.asarray(xs)
    for i, freq in enumerate(freqs):
        actual = (xs == i).mean()
        # 3-sigma binomial CI with a 3-count floor: "expected 0" bins really
        # have tiny positive probability (lambda*pi/(alpha-q) never vanishes
        # for valid actions), in this implementation and the reference alike.
        ci = max(3 * (freq * (1 - freq) / len(xs)) ** 0.5, 3 / len(xs))
        assert abs(actual - freq) <= ci, f"expected {freq:.2f}±{ci:.2f} at {i}, got {actual:.2f}"


def run_descend(tree, seed=0):
    B, T, _ = tree.children.shape
    rands = jax.random.uniform(jax.random.PRNGKey(seed), (B, T))
    return jax.jit(M.descend)(tree, rands)


def test_root_one_node():
    tree = make_tree(
        logits=np.log([[1 / 3, 2 / 3]]),
        w=[[0.0]],
        n=[0],
        c_puct=1.0,
        seats=[0],
        terminal=[False],
        children=[[-1, -1]],
    )
    r = jax.jit(M.root)(tree)
    probs = np.exp(np.asarray(r["logits"]))
    np.testing.assert_allclose(probs, np.tile([1 / 3, 2 / 3], (1024, 1)), rtol=2e-3, atol=2e-3)


def test_descend_one_node():
    tree = make_tree(
        logits=np.log([[1 / 3, 2 / 3]]),
        w=[[0.0]],
        n=[0],
        c_puct=1.0,
        seats=[0],
        terminal=[False],
        children=[[-1, -1]],
    )
    parents, actions = run_descend(tree)
    assert_distribution(parents, [1])
    assert_distribution(actions, [1 / 3, 2 / 3])


def _three_node_data(c_puct, terminal=(False, False, False)):
    return dict(
        logits=np.log([[1 / 3, 2 / 3], [1 / 4, 3 / 4], [1 / 5, 4 / 5]]),
        w=[[0.0], [0.0], [1.0]],
        n=[2, 1, 1],
        c_puct=c_puct,
        seats=[0, 0, 0],
        terminal=list(terminal),
        children=[[1, 2], [-1, -1], [-1, -1]],
    )


def test_high_cpuct():
    # High regularization: ignore q, stay close to the prior
    tree = make_tree(**_three_node_data(1000.0))
    parents, actions = run_descend(tree)
    assert_distribution(parents, [0, 1 / 3, 2 / 3])
    assert_distribution(actions, [1 / 3 * 1 / 4 + 2 / 3 * 1 / 5, 1 / 3 * 3 / 4 + 2 / 3 * 4 / 5])


def test_low_cpuct():
    # Low regularization: concentrate on the high-q path
    tree = make_tree(**_three_node_data(0.001))
    parents, actions = run_descend(tree)
    assert_distribution(parents, [0, 0, 1])
    assert_distribution(actions, [1 / 5, 4 / 5])


def test_balanced_cpuct():
    # Reconstruct alpha from the observed root distribution and check the
    # sum-to-one constraint it solves (reference mcts/tests.py:93-128)
    data = _three_node_data(2.0)
    tree = make_tree(**data)
    parents, _ = run_descend(tree)
    parents = np.asarray(parents)

    dist = np.array([(parents == 1).sum(), (parents == 2).sum()], float)
    p = dist / dist.sum()

    A = 2
    N = data["n"][0]
    lambda_n = data["c_puct"] * N / (A + N)
    pi = np.exp(data["logits"][0])
    w = np.array(data["w"])[:, 0]
    n = np.array(data["n"])
    q_raw = w / n
    # global min-max normalization as _transition_q applies (min over all
    # nodes = 0, max = 1 here already)
    q = q_raw[np.array(data["children"][0])]

    alphas = lambda_n * pi / p + q
    alpha = alphas.mean()
    unity = (lambda_n * pi / (alpha - q)).sum()
    assert abs(unity - 1) < 0.1


def test_terminal():
    # Transition to node 1 is terminal: descents stop there
    tree = make_tree(**_three_node_data(1000.0, terminal=(False, True, False)))
    parents, actions = run_descend(tree)
    assert_distribution(parents, [1 / 3, 0, 2 / 3])
    assert_distribution(actions, [1 / 3 + 2 / 3 * 1 / 5, 2 / 3 * 4 / 5])


# --------------------------------------------------------------------------
# Backup
# --------------------------------------------------------------------------

def backup_tree(v, w, n, rewards, parents, terminal):
    v = np.asarray(v, np.float32)[None]
    T, S = v.shape[1:]
    parents = np.asarray(parents, np.int32)
    # relation: each child is action 0 of its parent
    relation = np.where(parents >= 0, 0, -1).astype(np.int32)
    return M.Tree(
        children=jnp.full((1, T, 1), -1, jnp.int32),
        parents=jnp.asarray(parents[None]),
        relation=jnp.asarray(relation[None]),
        worlds=None,
        seats=jnp.zeros((1, T), jnp.int32),
        terminal=jnp.asarray(np.asarray(terminal, bool)[None]),
        rewards=jnp.asarray(np.asarray(rewards, np.float32)[None]),
        logits=jnp.zeros((1, T, 1), jnp.float32),
        v=jnp.asarray(v),
        n=jnp.asarray(np.asarray(n, np.int32)[None]),
        w=jnp.asarray(np.asarray(w, np.float32)[None]),
        n_edge=jnp.zeros((1, T, 1), jnp.float32),
        w_edge=jnp.zeros((1, T, 1), jnp.float32),
        c_puct=jnp.ones((1,), jnp.float32),
        sim=jnp.array(T, jnp.int32),
    )


def test_backup_simple():
    tree = backup_tree(
        v=[[1.0], [2.0]], w=[[3.0], [4.0]], n=[5, 6],
        rewards=[[0.0], [0.0]], parents=[-1, 0], terminal=[False, False],
    )
    out = jax.jit(M.backup, static_argnums=2)(tree, jnp.array([1]), 1)
    np.testing.assert_allclose(np.asarray(out.w), [[[5.0], [6.0]]])
    np.testing.assert_allclose(np.asarray(out.n), [[6, 7]])


def test_backup_rewards():
    tree = backup_tree(
        v=[[0.0], [0.0]], w=[[0.0], [0.0]], n=[0, 0],
        rewards=[[0.0], [1.0]], parents=[-1, 0], terminal=[False, False],
    )
    out = jax.jit(M.backup, static_argnums=2)(tree, jnp.array([1]), 1)
    np.testing.assert_allclose(np.asarray(out.w), [[[1.0], [1.0]]])
    np.testing.assert_allclose(np.asarray(out.n), [[1, 1]])


def test_backup_terminal():
    tree = backup_tree(
        v=[[0.0], [1.0], [2.0]], w=[[0.0], [0.0], [0.0]], n=[0, 0, 0],
        rewards=[[0.0], [3.0], [0.0]], parents=[-1, 0, 1], terminal=[False, True, False],
    )
    out = jax.jit(M.backup, static_argnums=2)(tree, jnp.array([2]), 1)
    np.testing.assert_allclose(np.asarray(out.w), [[[3.0], [3.0], [2.0]]])


# --------------------------------------------------------------------------
# Full searches on planted-value games
# --------------------------------------------------------------------------

def search(world, n_nodes, seed=0, **kwargs):
    agent = validation.ProxyAgent()
    cfg = M.MCTSConfig(n_nodes=n_nodes, **kwargs)
    run = jax.jit(lambda w, k: M.root(M.mcts(w, agent, k, cfg)))
    return run(world, jax.random.PRNGKey(seed))


def test_trivial():
    world = validation.Win.initial(n_envs=1)
    r = search(world, n_nodes=3)
    np.testing.assert_allclose(np.asarray(r["v"]), [[1.0]], atol=1e-5)


def test_two_player():
    world = validation.WinnerLoser.initial(n_envs=1)
    r = search(world, n_nodes=3)
    np.testing.assert_allclose(np.asarray(r["v"]), [[1.0, -1.0]], atol=1e-5)


def test_depth():
    world = validation.All.initial(n_envs=1, length=3)
    r = search(world, n_nodes=15, noise_eps=0.0)
    np.testing.assert_allclose(np.asarray(r["v"]), [[1 / 8]], atol=1e-5)


def test_multienv():
    world = validation.All.initial(n_envs=2, length=3)
    r = search(world, n_nodes=15, noise_eps=0.0)
    np.testing.assert_allclose(np.asarray(r["v"]), [[1 / 8], [1 / 8]], atol=1e-5)


def test_planted_game():
    # A competitive 3x3 position where columns 2 and 5 are the key cells
    # (reference mcts/tests.py:287-309)
    world = hex.from_string("""
    wb.
    bw.
    wb.
    """)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=63, c_puct=1.0, noise_eps=0.0)
    run = jax.jit(lambda w, k: M.root(M.mcts(w, agent, k, cfg)))
    r = run(world, jax.random.PRNGKey(3))
    probs = np.exp(np.asarray(r["logits"][0]))
    assert probs[2] > probs[8] and probs[5] > probs[7]


def test_agent_protocol():
    world = hex.Hex.initial(n_envs=4, boardsize=3)
    agent = M.MCTSAgent(validation.RandomAgent(), n_nodes=8)
    decisions = jax.jit(lambda w, k: agent(w, k))(world, jax.random.PRNGKey(0))
    assert decisions["actions"].shape == (4,)
    assert decisions["logits"].shape == (4, 9)
    assert decisions["v"].shape == (4, 2)
    valid = np.asarray(world.valid)
    acts = np.asarray(decisions["actions"])
    assert all(valid[e, acts[e]] for e in range(4))


def test_dummy_agent():
    world = hex.Hex.initial(n_envs=4, boardsize=3)
    agent = M.DummyAgent(validation.RandomAgent())
    decisions = jax.jit(lambda w, k: agent(w, k))(world, jax.random.PRNGKey(0))
    assert decisions["actions"].shape == (4,)
    assert np.asarray(decisions["n_sims"]).tolist() == [0, 0, 0, 0]


def test_backup_visits_mode():
    # the lambda_N fix: n increments once per visit, not once per seat
    # (reference Issue #15; see MCTSConfig.backup_n)
    tree = backup_tree(
        v=[[1.0, -1.0], [2.0, -2.0]], w=[[0.0, 0.0], [0.0, 0.0]], n=[0, 0],
        rewards=[[0.0, 0.0], [0.0, 0.0]], parents=[-1, 0], terminal=[False, False],
    )
    out_ref_mode = jax.jit(M.backup, static_argnums=2)(tree, jnp.array([1]), 2)
    out_fixed = jax.jit(M.backup, static_argnums=2)(tree, jnp.array([1]), 1)
    assert np.asarray(out_ref_mode.n).tolist() == [[2, 2]]
    assert np.asarray(out_fixed.n).tolist() == [[1, 1]]
    # w identical in both modes
    np.testing.assert_allclose(np.asarray(out_ref_mode.w), np.asarray(out_fixed.w))


def test_descend_matches_reference_walk():
    # The production `descend` (all-node vectorized solves + pointer chase)
    # must be bit-identical to `descend_reference` (the level-serial
    # executable spec) on real mid-search trees of every depth.
    world = hex.Hex.initial(n_envs=64, boardsize=5)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=24, use_pallas=False)

    key = jax.random.PRNGKey(7)
    tree = M.search.build(world, cfg)
    tree = M.search.initialize(tree, agent(world, None), key, cfg, world.valid)

    sim = jax.jit(lambda t, k: M.search.simulate(t, agent, k, cfg))
    both = jax.jit(lambda t, r: (M.descend(t, r), M.search.descend_reference(t, r)))
    for i in range(cfg.n_nodes - 1):
        key, k_sim, k_rand = jax.random.split(key, 3)
        rands = jax.random.uniform(k_rand, tree.terminal.shape)
        (p_new, a_new), (p_ref, a_ref) = both(tree, rands)
        np.testing.assert_array_equal(np.asarray(p_new), np.asarray(p_ref))
        np.testing.assert_array_equal(np.asarray(a_new), np.asarray(a_ref))
        tree = sim(tree, k_sim)


def test_backup_path_matches_backup(monkeypatch):
    # The production simulate backs up along the path RECORDED by the descend
    # walk (`backup_path`); forcing it back onto the pointer-chase `backup`
    # must leave every stat tensor bit-identical over a whole real search.
    world = hex.Hex.initial(n_envs=32, boardsize=5)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=24, use_pallas=False)
    key = jax.random.PRNGKey(11)

    tree_path = M.search.mcts(world, agent, key, cfg)
    monkeypatch.setattr(
        M.search, "backup_path",
        lambda tree, path, acts, leaves, npv: M.search.backup(tree, leaves, npv),
    )
    tree_chase = M.search.mcts(world, agent, key, cfg)

    # counts and topology are exact; value sums differ only by f32 summation
    # order (einsum-routed vs sequential adds)
    for name in ("n", "n_edge", "children", "parents"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tree_path, name)).astype(np.float32),
            np.asarray(getattr(tree_chase, name)).astype(np.float32),
            err_msg=name,
        )
    for name in ("w", "w_edge"):
        np.testing.assert_allclose(
            np.asarray(getattr(tree_path, name)),
            np.asarray(getattr(tree_chase, name)),
            atol=1e-5, err_msg=name,
        )


# --------------------------------------------------------------------------
# Batched multi-leaf MCTS (leaves_per_pass > 1)
# --------------------------------------------------------------------------

def test_multi_k1_matches_simulate():
    # simulate_multi with K=1 must reproduce the sequential XLA path exactly
    # (same rands, same walk, same writes, same backup)
    world = hex.Hex.initial(n_envs=16, boardsize=5)
    agent = validation.RandomAgent()
    cfg1 = M.MCTSConfig(n_nodes=17, use_pallas=False)
    cfgm = M.MCTSConfig(n_nodes=17, use_pallas=False, leaves_per_pass=1)
    key = jax.random.PRNGKey(2)

    tree1 = M.search.build(world, cfg1)
    d = agent(world, None)
    tree1 = M.search.initialize(tree1, d, key, cfg1, world.valid)
    treem = tree1

    for i in range(8):
        k = jax.random.PRNGKey(100 + i)
        tree1 = M.search.simulate(tree1, agent, k, cfg1)
        treem = M.search.simulate_multi(treem, agent, k, cfgm)

    np.testing.assert_array_equal(np.asarray(tree1.children), np.asarray(treem.children))
    np.testing.assert_array_equal(np.asarray(tree1.n), np.asarray(treem.n))
    np.testing.assert_array_equal(
        np.asarray(tree1.n_edge, np.float32), np.asarray(treem.n_edge, np.float32))
    np.testing.assert_allclose(
        np.asarray(tree1.w), np.asarray(treem.w), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tree1.logits, np.float32), np.asarray(treem.logits, np.float32),
        atol=1e-5)


def test_multi_invariants():
    # K=4: slot accounting, pointer consistency, edge/node stat consistency
    world = hex.Hex.initial(n_envs=32, boardsize=5)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=25, leaves_per_pass=4, use_pallas=False)
    tree = jax.jit(lambda w, k: M.search.mcts(w, agent, k, cfg))(
        world, jax.random.PRNGKey(5))

    children = np.asarray(tree.children, np.int32)
    parents = np.asarray(tree.parents)
    relation = np.asarray(tree.relation)
    n_edge = np.asarray(tree.n_edge, np.float32)
    B, T, A = children.shape
    assert T == 1 + 4 * 6  # capacity = 1 + K * ceil((n_nodes-1)/K)
    assert int(tree.sim) == T

    for b in range(8):
        for t in range(T):
            for a in range(A):
                c = children[b, t, a]
                if c >= 0:
                    # pointer consistency: child's parent/relation row agrees
                    assert parents[b, c] == t, (b, t, a, c)
                    assert relation[b, c] == a
        # visited edges have positive counts; root visits sum to total visits
        assert n_edge[b, 0].sum() > 0


def test_multi_planted_game():
    # the K>1 search must still solve the planted 3x3 position
    world = hex.from_string("""
    wb.
    bw.
    wb.
    """)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=63, c_puct=1.0, noise_eps=0.0, leaves_per_pass=4,
                       use_pallas=False)
    run = jax.jit(lambda w, k: M.root(M.mcts(w, agent, k, cfg)))
    r = run(world, jax.random.PRNGKey(3))
    probs = np.exp(np.asarray(r["logits"][0]))
    assert probs[2] > probs[8] and probs[5] > probs[7]


def test_multi_depth_value():
    # planted exact value still recovered with K=2 on the All game
    world = validation.All.initial(n_envs=2, length=3)
    agent = validation.ProxyAgent()
    cfg = M.MCTSConfig(n_nodes=15, noise_eps=0.0, leaves_per_pass=2,
                       use_pallas=False)
    tree = jax.jit(lambda w, k: M.search.mcts(w, agent, k, cfg))(
        world, jax.random.PRNGKey(1))
    r = M.root(tree)
    np.testing.assert_allclose(np.asarray(r["v"]), [[1 / 8], [1 / 8]], atol=1e-5)


def test_solve_policy_warm_start():
    # a warm restart from a converged alpha of a slightly-perturbed problem
    # reaches the same err<tol contract in a fraction of the iterations
    rng = np.random.default_rng(0)
    B, A = 256, 81
    logits = rng.normal(size=(B, A)).astype(np.float32)
    pi = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    q = rng.uniform(size=(B, A)).astype(np.float32)
    lam = rng.uniform(0.05, 2.0, size=(B,)).astype(np.float32)

    probs0, alpha0 = M.search.solve_policy(
        jnp.asarray(pi), jnp.asarray(q), jnp.asarray(lam), return_alpha=True)
    s0 = np.asarray(probs0.sum(-1))
    assert (s0 < 1 + 2e-3).all() and (s0 > 0.9).all()

    # perturb q a little (one backup's worth of drift) and re-solve warm with
    # half the cold budget (rows whose root moved UP restart warm and converge
    # in 1-2 iters; rows whose root moved DOWN reject the warm init — it sits
    # above the new root — and re-run the cold path, which needs ~8 here)
    q2 = np.clip(q + rng.normal(scale=1e-3, size=q.shape), 0, 1).astype(np.float32)
    probs_w, _ = M.search.solve_policy(
        jnp.asarray(pi), jnp.asarray(q2), jnp.asarray(lam), n_iters=8,
        warm_alpha=alpha0, return_alpha=True)
    s_w = np.asarray(probs_w.sum(-1))
    assert (s_w < 1 + 2e-3).all() and (s_w > 0.9).all()

    # zeros (the build-time init) must fall back to the cold init: same
    # result as the plain cold solve, bitwise
    probs_z = M.search.solve_policy(
        jnp.asarray(pi), jnp.asarray(q), jnp.asarray(lam),
        warm_alpha=jnp.zeros((B,)))
    np.testing.assert_array_equal(np.asarray(probs_z), np.asarray(probs0))


def test_grow_passes_invariants():
    # triangular-pass mode: same structural invariants as the scan path
    world = hex.Hex.initial(n_envs=32, boardsize=5)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=25, leaves_per_pass=4, use_pallas=False,
                       grow_passes=True)
    tree = jax.jit(lambda w, k: M.search.mcts(w, agent, k, cfg))(
        world, jax.random.PRNGKey(5))

    children = np.asarray(tree.children, np.int32)
    parents = np.asarray(tree.parents)
    relation = np.asarray(tree.relation)
    n_edge = np.asarray(tree.n_edge, np.float32)
    B, T, A = children.shape
    assert T == 1 + 4 * 6
    assert int(tree.sim) == T

    for b in range(8):
        for t in range(T):
            for a in range(A):
                c = children[b, t, a]
                if c >= 0:
                    assert parents[b, c] == t, (b, t, a, c)
                    assert relation[b, c] == a
        assert n_edge[b, 0].sum() > 0


def test_grow_passes_planted_game():
    # triangular-pass mode still solves the planted 3x3 position
    world = hex.from_string("""
    wb.
    bw.
    wb.
    """)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=63, c_puct=1.0, noise_eps=0.0,
                       leaves_per_pass=4, use_pallas=False, grow_passes=True)
    run = jax.jit(lambda w, k: M.root(M.mcts(w, agent, k, cfg)))
    r = run(world, jax.random.PRNGKey(3))
    probs = np.exp(np.asarray(r["logits"][0]))
    assert probs[2] > probs[8] and probs[5] > probs[7]


def test_grow_passes_depth_value():
    # planted exact value recovered with K=2 triangular passes
    world = validation.All.initial(n_envs=2, length=3)
    agent = validation.ProxyAgent()
    cfg = M.MCTSConfig(n_nodes=15, noise_eps=0.0, leaves_per_pass=2,
                       use_pallas=False, grow_passes=True)
    tree = jax.jit(lambda w, k: M.search.mcts(w, agent, k, cfg))(
        world, jax.random.PRNGKey(1))
    r = M.root(tree)
    np.testing.assert_allclose(np.asarray(r["v"]), [[1 / 8], [1 / 8]], atol=1e-5)


def test_grow_passes_root_close_to_scan():
    # grow vs scan: same algorithm, different rand-stream shapes — the root
    # visit distributions over a big batch must agree closely
    world = hex.Hex.initial(n_envs=512, boardsize=3)
    agent = validation.RandomAgent()
    base = dict(n_nodes=9, leaves_per_pass=4, use_pallas=False, noise_eps=0.0)
    r_scan = jax.jit(lambda w, k: M.root(M.mcts(
        w, agent, k, M.MCTSConfig(**base))))(world, jax.random.PRNGKey(2))
    r_grow = jax.jit(lambda w, k: M.root(M.mcts(
        w, agent, k, M.MCTSConfig(grow_passes=True, **base))))(
        world, jax.random.PRNGKey(2))
    p_scan = np.exp(np.asarray(r_scan["logits"], np.float64)).mean(0)
    p_grow = np.exp(np.asarray(r_grow["logits"], np.float64)).mean(0)
    # batch-mean root policies: 3-sigma-ish band for 512 envs
    np.testing.assert_allclose(p_scan, p_grow, atol=0.08)


def test_multi_warm_solve_matches_cold_distribution():
    # warm_solve changes converged alphas only within the err<tol contract:
    # root visit distributions of warm vs cold searches stay close
    world = hex.Hex.initial(n_envs=64, boardsize=5)
    agent = validation.RandomAgent()
    # pinned to an ample 6-iteration budget on BOTH sides so each is fully
    # converged — the comparison isolates warm-starting itself (the default
    # warm-3 budget relies on the warm start for its convergence margin)
    cfg_w = M.MCTSConfig(n_nodes=17, leaves_per_pass=4, use_pallas=False,
                         warm_solve=True, solve_iters=6)
    cfg_c = M.MCTSConfig(n_nodes=17, leaves_per_pass=4, use_pallas=False,
                         warm_solve=False, solve_iters=6)
    key = jax.random.PRNGKey(3)
    t_w = M.search.mcts(world, agent, key, cfg_w)
    t_c = M.search.mcts(world, agent, key, cfg_c)
    # same node budget spent
    np.testing.assert_array_equal(
        np.asarray(t_w.n.sum(-1)), np.asarray(t_c.n.sum(-1)))
    # root children visit counts agree on average (tolerance-equivalent
    # solves sample near-identical actions)
    dn = np.abs(np.asarray(t_w.n_edge[:, 0], np.float32)
                - np.asarray(t_c.n_edge[:, 0], np.float32))
    assert dn.mean() < 0.5, dn.mean()


def test_sampler_matmul_matches_shift_on_dyadic_probs():
    # the matmul-cum + count formulation vs the log-shift + masked-min one:
    # with dyadic (exactly representable) probs both prefix sums are exact,
    # so the two formulations must agree BITWISE — including the edge cases:
    # rand == 0 on a zero-prob lane 0, rand exactly on a cum boundary,
    # rand past an (unnormalized) total, and an all-zero row.
    B, T, A = 4, 2, 8
    base = np.zeros((B, T, A), np.float32)
    base[..., :] = [0.0, 0.25, 0.0, 0.125, 0.5, 0.125, 0.0, 0.0]
    base[1] = [0.0] * 8  # all-zero rows -> fallback path
    base[2, :, :] = [0.5, 0.25, 0.125, 0.0625, 0.03125, 0.0, 0.0, 0.0]
    base[3, :, :] = [0.0, 0.5, 0.25, 0.0, 0.0, 0.0, 0.0, 0.0]  # total 0.75
    probs = jnp.asarray(base)
    rng = np.random.default_rng(0)
    children = jnp.asarray(
        rng.integers(-1, T, size=(B, T, A)).astype(np.int8))
    tree = SimpleNamespace(children=children)

    K = 5
    rands = np.broadcast_to(
        np.array([0.0, 0.25, 0.5, 0.9375, 0.999], np.float32)[:, None, None],
        (K, B, T)).copy()
    rands[4] = rng.uniform(size=(B, T))  # plus generic draws
    rands = jnp.asarray(rands)

    a_m, c_m = M.search._sample_children_multi(tree, probs, rands,
                                               cum_mode="matmul")
    a_s, c_s = M.search._sample_children_multi(tree, probs, rands,
                                               cum_mode="shift")
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(a_s))
    np.testing.assert_array_equal(np.asarray(c_m), np.asarray(c_s))


def test_solve_policy_mixed_contract():
    # the halley+newton mix meets a TWO-SIDED |err|<tol on rows the one-sided
    # newton-16 solves, at a quarter of the iterations
    rng = np.random.default_rng(5)
    B, A = 512, 81
    logits = rng.normal(size=(B, A)).astype(np.float32)
    pi = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    q = rng.uniform(size=(B, A)).astype(np.float32)
    lam = rng.uniform(0.05, 2.0, size=(B,)).astype(np.float32)

    probs, alpha = M.search.solve_policy(
        jnp.asarray(pi), jnp.asarray(q), jnp.asarray(lam),
        n_iters=6, accel=True, return_alpha=True)
    s = np.asarray(probs.sum(-1))
    assert (np.abs(s - 1.0) < 2e-3).all(), (s.min(), s.max())

    # brutal lambda range: the safeguard must keep every row off the q-pole
    lam_b = rng.uniform(0.0005, 1000.0, size=(B,)).astype(np.float32)
    probs_b = M.search.solve_policy(
        jnp.asarray(pi), jnp.asarray(q), jnp.asarray(lam_b),
        n_iters=6, accel=True)
    s_b = np.asarray(probs_b.sum(-1))
    assert (np.abs(s_b - 1.0) < 2e-3).all(), (s_b.min(), s_b.max())


def test_multi_default_solve_converges_on_live_rows():
    # The production K>1 defaults (cold accel solve_iters=6) must satisfy the
    # TWO-SIDED |err| < tol convergence contract on every reachable node row
    # of a real multi-leaf tree — the headline claim solve_policy makes.
    # (Warm-3 measurably violates this on 20-40% of live rows; see MCTSConfig.)
    world = hex.Hex.initial(n_envs=128, boardsize=5)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=33, leaves_per_pass=8, use_pallas=False)
    tree = M.search.mcts(world, agent, jax.random.PRNGKey(2), cfg)

    probs = M.search.node_probs(
        tree, M.search._q_bounds(tree),
        n_iters=cfg.solve_iters, accel=cfg.solve_accel)
    err = np.abs(np.asarray(probs.sum(-1)) - 1.0)  # (B,T)
    T = err.shape[1]
    live = (np.arange(T)[None, :] < int(tree.sim)) & ~np.asarray(tree.terminal)
    assert (err[live] < 1e-3).all(), err[live].max()


def test_fixed_round_gamma_matches_dirichlet_moments():
    # The fixed-round Marsaglia-Tsang sampler replaces jax.random.dirichlet's
    # while_loop rejection (search.py::_log_gamma_fixed). Check the normalized
    # draw against the analytic symmetric-Dirichlet moments at the production
    # shape parameter (alpha_scale/A with A=81 -> alpha ~ 0.1235).
    A, N = 81, 4096
    a = 10.0 / A

    @jax.jit
    def draw(key):
        log_g = M.search._log_gamma_fixed(key, a, (N, A))
        g = jnp.exp(log_g - jnp.max(log_g, -1, keepdims=True))
        return g / g.sum(-1, keepdims=True)

    x = np.asarray(draw(jax.random.PRNGKey(0)))
    assert np.isfinite(x).all() and (x >= 0).all()
    np.testing.assert_allclose(x.sum(-1), 1.0, atol=1e-5)

    # symmetric Dirichlet: E[x_i] = 1/A, Var[x_i] = (A-1)/(A^2 (A*a + 1))
    mean, var = x.mean(), x.var()
    exp_mean = 1.0 / A
    exp_var = (A - 1.0) / (A**2 * (A * a + 1.0))
    # N*A ~ 330k variates: moment estimates are tight to a few percent
    assert abs(mean - exp_mean) < 0.02 * exp_mean, (mean, exp_mean)
    assert abs(var - exp_var) < 0.05 * exp_var, (var, exp_var)

    # shape signature: per-row max mass must match jax.random.dirichlet's
    # (the exact rejection sampler) — catches accidentally-uniform draws
    y = np.asarray(jax.jit(lambda k: jax.random.dirichlet(
        k, jnp.full((A,), a), shape=(N,)))(jax.random.PRNGKey(1)))
    ours, ref = x.max(-1).mean(), y.max(-1).mean()
    assert abs(ours - ref) < 0.1 * ref, (ours, ref)


def test_dirichlet_noise_matches_reference_semantics():
    # eps=0 must leave the prior untouched; eps=1 must be the pure draw with
    # invalid actions at probability exactly 0 (reference mcts/__init__.py:13-24)
    B, A = 64, 25
    key = jax.random.PRNGKey(3)
    logits = jax.nn.log_softmax(jax.random.normal(key, (B, A)), -1)
    valid = jax.random.uniform(jax.random.PRNGKey(4), (B, A)) < 0.7
    valid = valid.at[:, 0].set(True)

    f = jax.jit(lambda eps: M.search.dirichlet_noise(key, logits, valid, eps))
    np.testing.assert_allclose(
        np.asarray(f(0.0)), np.asarray(logits), rtol=1e-5, atol=1e-6)
    pure = np.exp(np.asarray(f(1.0)))
    np.testing.assert_allclose(pure.sum(-1), 1.0, atol=1e-5)
    assert (pure[~np.asarray(valid)] == 0).all()


# --------------------------------------------------------------------------
# Prefix backup (backup_mode='prefix', Tree.prew)
# --------------------------------------------------------------------------

from flax import struct as _struct
from boardlaw_tpu.envs.base import Transition as _Transition
from boardlaw_tpu.envs.base import Tensor as _Tensor, Masked as _Masked


class StepRewardGame(_struct.PyTreeNode):
    """Synthetic 2-seat game with NON-TERMINAL rewards: every ply pays the
    acting seat (action+1)/8, terminal after 6 plies (which also pays +1 to
    seat 0). Exists purely to exercise the cumulative-reward prefix (Hex and
    the validation games only reward at termination, where Tree.prew stays
    identically zero)."""

    count: jnp.ndarray  # (B,) plies played

    @classmethod
    def initial(cls, n_envs):
        return cls(count=jnp.zeros((n_envs,), jnp.int32))

    @property
    def n_envs(self):
        return self.count.shape[0]

    @property
    def n_seats(self):
        return 2

    @property
    def obs_space(self):
        return _Tensor((1,))

    @property
    def action_space(self):
        return _Masked(3)

    @property
    def valid(self):
        return jnp.ones((self.n_envs, 3), bool)

    @property
    def seats(self):
        return (self.count % 2).astype(jnp.int32)

    @property
    def obs(self):
        return (self.count[:, None] / 6.0).astype(jnp.float32)

    def step(self, actions):
        seat_oh = jax.nn.one_hot(self.seats, 2, dtype=jnp.float32)
        rewards = seat_oh * (actions[:, None] + 1.0) / 8.0
        count = self.count + 1
        terminal = count >= 6
        rewards = rewards + terminal[:, None] * jnp.array([1.0, 0.0])
        count = jnp.where(terminal, 0, count)
        return self.replace(count=count), _Transition(
            terminal=terminal, rewards=rewards)


def _prefix_backup_inputs(world, cfg, key):
    """Drive the multi-leaf search pass by pass (mirroring mcts()'s grow and
    scan drivers), capturing each pass's CONCRETE backup inputs via
    simulate_multi(return_backup_inputs=True) and advancing with the real
    prefix backup — everything jitted (an unjitted mcts() is unusable under
    the remote-compile hook). Returns [(tree, paths, acts, leaves, npv)]."""
    agent = validation.RandomAgent()
    tree = M.search.build(world, cfg)
    k_init, k_sims = jax.random.split(key)
    d = agent(world, None)
    tree = jax.jit(
        lambda t, de, k, v: M.search.initialize(t, de, k, cfg, v)
    )(tree, d, k_init, world.valid)

    K = cfg.leaves_per_pass
    T = tree.children.shape[1]
    n_passes = -(-(cfg.n_nodes - 1) // K)
    step = jax.jit(
        lambda t, k, ml, pw: M.search.simulate_multi(
            t, agent, k, cfg, max_levels=ml, pad_walk_to=pw,
            return_backup_inputs=True),
        static_argnums=(2, 3))
    bk = jax.jit(M.search.backup_paths_prefix, static_argnums=(4,))

    captured = []
    if cfg.grow_passes:
        sub = M.search._slice_tree(tree, min(T, 1 + K))
        for p in range(n_passes):
            R = min(T, 1 + (p + 1) * K)
            if sub.parents.shape[1] < R:
                sub = jax.jit(M.search._pad_tree, static_argnums=1)(sub, R)
            out = step(sub, jax.random.fold_in(k_sims, p), p + 2, T)
            out = (*out[:4], int(out[4]))  # npv exits jit as a device scalar
            captured.append(out)
            sub = bk(*out)
    else:
        for p in range(n_passes):
            out = step(tree, jax.random.fold_in(k_sims, p), None, None)
            out = (*out[:4], int(out[4]))
            captured.append(out)
            tree = bk(*out)
    assert captured, "prefix backup was never dispatched"
    return captured


@pytest.mark.parametrize("grow", [False, True])
def test_backup_prefix_matches_einsum_hex(grow):
    # every pass of a real 5x5 multi-leaf search: the prefix backup must
    # reproduce the einsum backup's deltas (n/n_edge exactly, w/w_edge to
    # f32 roundoff)
    world = hex.Hex.initial(n_envs=16, boardsize=5)
    cfg = M.MCTSConfig(n_nodes=21, leaves_per_pass=4, use_pallas=False,
                       grow_passes=grow)
    for tree, paths, acts, leaves, npv in _prefix_backup_inputs(
            world, cfg, jax.random.PRNGKey(7)):
        new = M.search.backup_paths_prefix(tree, paths, acts, leaves, npv)
        old = M.search.backup_paths(tree, paths, acts, leaves, npv)
        np.testing.assert_array_equal(np.asarray(new.n), np.asarray(old.n))
        np.testing.assert_array_equal(
            np.asarray(new.n_edge, np.float32), np.asarray(old.n_edge, np.float32))
        np.testing.assert_allclose(
            np.asarray(new.w), np.asarray(old.w), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new.w_edge, np.float32),
            np.asarray(old.w_edge, np.float32), atol=1e-5)


def test_backup_prefix_matches_einsum_interior_rewards():
    # same parity on a game whose interior nodes carry rewards, so the
    # prew maintenance (parent prefix + own reward at expansion) is live
    world = StepRewardGame.initial(n_envs=24)
    cfg = M.MCTSConfig(n_nodes=25, leaves_per_pass=4, use_pallas=False,
                       grow_passes=True)
    calls = _prefix_backup_inputs(world, cfg, jax.random.PRNGKey(3))
    saw_nonzero_prew = False
    for tree, paths, acts, leaves, npv in calls:
        saw_nonzero_prew = saw_nonzero_prew or bool(
            (np.abs(np.asarray(tree.prew)) > 0).any())
        new = M.search.backup_paths_prefix(tree, paths, acts, leaves, npv)
        old = M.search.backup_paths(tree, paths, acts, leaves, npv)
        np.testing.assert_array_equal(np.asarray(new.n), np.asarray(old.n))
        np.testing.assert_array_equal(
            np.asarray(new.n_edge, np.float32), np.asarray(old.n_edge, np.float32))
        np.testing.assert_allclose(
            np.asarray(new.w), np.asarray(old.w), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new.w_edge, np.float32),
            np.asarray(old.w_edge, np.float32), atol=1e-5)
    assert saw_nonzero_prew, "interior rewards never reached prew"


def test_backup_prefix_prew_invariant():
    # after a full search, prew[t] must equal the sum of rewards along the
    # root->t chain (inclusive) for every expanded node
    world = StepRewardGame.initial(n_envs=8)
    cfg = M.MCTSConfig(n_nodes=17, leaves_per_pass=4, use_pallas=False,
                       grow_passes=True)
    agent = validation.RandomAgent()
    tree = M.search.mcts(world, agent, jax.random.PRNGKey(11), cfg)
    parents = np.asarray(tree.parents)
    rewards = np.asarray(tree.rewards)
    prew = np.asarray(tree.prew)
    B, T = parents.shape
    for b in range(B):
        for t in range(T):
            if t > 0 and parents[b, t] < 0:
                continue  # unexpanded slot
            acc, cur = np.zeros(rewards.shape[-1]), t
            while cur >= 0:
                acc += rewards[b, cur]
                cur = parents[b, cur]
            np.testing.assert_allclose(prew[b, t], acc, atol=1e-5,
                                       err_msg=f"env {b} node {t}")


def test_backup_prefix_planted_game():
    # end-to-end semantics: the default (prefix) search still solves the
    # planted 3x3 position and recovers the exact planted value
    world = hex.from_string("""
    wb.
    bw.
    wb.
    """)
    agent = validation.RandomAgent()
    cfg = M.MCTSConfig(n_nodes=63, c_puct=1.0, noise_eps=0.0,
                       leaves_per_pass=4, use_pallas=False, grow_passes=True,
                       backup_mode="prefix")
    r = jax.jit(lambda w, k: M.root(M.mcts(w, agent, k, cfg)))(
        world, jax.random.PRNGKey(3))
    probs = np.exp(np.asarray(r["logits"][0]))
    assert probs[2] > probs[8] and probs[5] > probs[7]

    world2 = validation.All.initial(n_envs=2, length=3)
    cfg2 = M.MCTSConfig(n_nodes=15, noise_eps=0.0, leaves_per_pass=2,
                        use_pallas=False, grow_passes=True)
    tree = jax.jit(lambda w, k: M.search.mcts(w, validation.ProxyAgent(), k, cfg2))(
        world2, jax.random.PRNGKey(1))
    r2 = M.root(tree)
    np.testing.assert_allclose(np.asarray(r2["v"]), [[1 / 8], [1 / 8]], atol=1e-5)


@pytest.mark.parametrize("grow", [False, True])
def test_write_mode_select_matches_einsum(grow):
    # both routings are exact (select: direct masked writes; einsum: bf16
    # one-hot contractions with every payload value < 2^8), so full searches
    # must produce BIT-identICAL trees
    world = hex.Hex.initial(n_envs=32, boardsize=5)
    agent = validation.RandomAgent()
    base = dict(n_nodes=21, leaves_per_pass=4, use_pallas=False,
                grow_passes=grow)
    t_sel = jax.jit(lambda w, k: M.search.mcts(
        w, agent, k, M.MCTSConfig(write_mode="select", **base)))(
        world, jax.random.PRNGKey(9))
    t_ein = jax.jit(lambda w, k: M.search.mcts(
        w, agent, k, M.MCTSConfig(write_mode="einsum", **base)))(
        world, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(t_sel.children), np.asarray(t_ein.children))
    np.testing.assert_array_equal(np.asarray(t_sel.parents), np.asarray(t_ein.parents))
    np.testing.assert_array_equal(
        np.asarray(t_sel.logits, np.float32), np.asarray(t_ein.logits, np.float32))
    np.testing.assert_array_equal(np.asarray(t_sel.n), np.asarray(t_ein.n))
    np.testing.assert_array_equal(np.asarray(t_sel.w), np.asarray(t_ein.w))
    np.testing.assert_array_equal(
        np.asarray(t_sel.n_edge, np.float32), np.asarray(t_ein.n_edge, np.float32))


def test_gather_mode_take_matches_einsum():
    # both parent-row gathers are exact -> bit-identical full searches
    world = hex.Hex.initial(n_envs=32, boardsize=5)
    agent = validation.RandomAgent()
    base = dict(n_nodes=21, leaves_per_pass=4, use_pallas=False,
                grow_passes=True)
    t_a = jax.jit(lambda w, k: M.search.mcts(
        w, agent, k, M.MCTSConfig(gather_mode="take", **base)))(
        world, jax.random.PRNGKey(9))
    t_b = jax.jit(lambda w, k: M.search.mcts(
        w, agent, k, M.MCTSConfig(gather_mode="einsum", **base)))(
        world, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(t_a.children), np.asarray(t_b.children))
    np.testing.assert_array_equal(
        np.asarray(t_a.logits, np.float32), np.asarray(t_b.logits, np.float32))
    np.testing.assert_array_equal(np.asarray(t_a.n), np.asarray(t_b.n))
    np.testing.assert_array_equal(np.asarray(t_a.w), np.asarray(t_b.w))
