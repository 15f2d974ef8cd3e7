"""Golden parity vs the REFERENCE's own compiled engines (BASELINE.md
correctness target: exact fixed-seed trajectory/terminal-return match).

Random games are driven by one shared action stream; at every ply the JAX env
and the reference C++ env must agree exactly on board labels, observations,
rewards and resets. MCTS root/backup are compared on randomized trees.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs.hex import Hex
from boardlaw_tpu import mcts as M

try:
    from ref_engines import hex_engine, mcts_engine

    _hex = hex_engine()
    _mcts = mcts_engine()
except Exception as e:  # pragma: no cover - build environment dependent
    _hex = _mcts = None
    _build_error = e


needs_engines = pytest.mark.skipif(
    _hex is None, reason="reference C++ engines failed to build"
)


@needs_engines
@pytest.mark.parametrize("boardsize", [3, 5, 9, 11])
def test_hex_exact_parity(boardsize):
    rng = np.random.default_rng(1234 + boardsize)
    B = 16
    world = Hex.initial(B, boardsize)

    # reference state (the auto-reset logic lives in the python wrapper,
    # reference hex/__init__.py:161-195 — replicated here)
    ref_board = torch.zeros((B, boardsize, boardsize), dtype=torch.uint8)
    ref_seats = torch.zeros((B,), dtype=torch.int)

    step = jax.jit(lambda w, a: w.step(a))
    probe = jax.jit(lambda w: (w.obs, w.valid))

    for ply in range(6 * boardsize * boardsize):
        obs, valid = jax.tree.map(np.asarray, probe(world))

        ref_obs = _hex.observe(ref_board, ref_seats).numpy()
        np.testing.assert_array_equal(obs, ref_obs, err_msg=f"obs ply {ply}")
        ref_valid = (ref_obs == 0).all(-1).reshape(B, -1)
        np.testing.assert_array_equal(valid, ref_valid, err_msg=f"valid ply {ply}")

        actions = np.array([rng.choice(np.flatnonzero(valid[e])) for e in range(B)])

        # ours
        world, tr = step(world, jnp.asarray(actions))

        # reference
        new_board = ref_board.clone()
        rewards = _hex.step(new_board, ref_seats, torch.as_tensor(actions, dtype=torch.int))
        terminal = (rewards > 0).any(-1)
        new_board[terminal] = 0
        new_seats = 1 - ref_seats
        new_seats[terminal] = 0
        ref_board, ref_seats = new_board, new_seats

        np.testing.assert_array_equal(
            np.asarray(tr.rewards), rewards.numpy(), err_msg=f"rewards ply {ply}"
        )
        np.testing.assert_array_equal(
            np.asarray(tr.terminal), terminal.numpy(), err_msg=f"terminal ply {ply}"
        )
        np.testing.assert_array_equal(
            np.asarray(world.board), ref_board.numpy(), err_msg=f"board ply {ply}"
        )
        np.testing.assert_array_equal(
            np.asarray(world.seats), ref_seats.numpy(), err_msg=f"seats ply {ply}"
        )


def _random_tree(rng, B, T, A, S):
    """A structurally valid random search tree, in both engines' formats."""
    children = np.full((T, A), -1, np.int64)
    parents = np.full((T,), -1, np.int64)
    relation = np.full((T,), -1, np.int64)
    seats = rng.integers(0, S, T)
    terminal = np.zeros(T, bool)
    for c in range(1, T):
        p = rng.integers(0, c)
        free = np.flatnonzero(children[p] == -1)
        if len(free) == 0:
            continue
        a = rng.choice(free)
        children[p, a] = c
        parents[c] = p
        relation[c] = a
        terminal[c] = rng.random() < 0.15
    terminal[0] = False

    logits = rng.normal(0, 1, (T, A))
    logits = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    n = rng.integers(1, 20, T)
    w = rng.normal(0, 2, (T, S))

    def rep(x):
        return np.broadcast_to(x[None], (B,) + x.shape).copy()

    return dict(
        children=rep(children), parents=rep(parents), relation=rep(relation),
        seats=rep(seats), terminal=rep(terminal), logits=rep(logits),
        n=rep(n), w=rep(w),
    )


def _to_jax_tree(d, c_puct):
    B, T, A = d["logits"].shape
    S = d["w"].shape[-1]
    n_edge = np.zeros((B, T, A), np.float32)
    w_edge = np.zeros((B, T, A), np.float32)
    ch = d["children"]
    for t in range(T):
        for a in range(A):
            cs = ch[0, t, a]
            if cs > -1:
                n_edge[:, t, a] = d["n"][:, cs]
                w_edge[:, t, a] = d["w"][np.arange(B), cs, d["seats"][:, t]]
    return M.Tree(
        children=jnp.asarray(d["children"], jnp.int32),
        parents=jnp.asarray(d["parents"], jnp.int32),
        relation=jnp.asarray(d["relation"], jnp.int32),
        worlds=None,
        seats=jnp.asarray(d["seats"], jnp.int32),
        terminal=jnp.asarray(d["terminal"]),
        rewards=jnp.zeros((B, T, S), jnp.float32),
        logits=jnp.asarray(d["logits"], jnp.float32),
        v=jnp.zeros((B, T, S), jnp.float32),
        n=jnp.asarray(d["n"], jnp.int32),
        w=jnp.asarray(d["w"], jnp.float32),
        n_edge=jnp.asarray(n_edge),
        w_edge=jnp.asarray(w_edge),
        c_puct=jnp.full((B,), c_puct, jnp.float32),
        sim=jnp.array(T, jnp.int32),
    )


def _to_ref_mcts(d, c_puct):
    B = d["logits"].shape[0]
    return _mcts.MCTS(
        torch.as_tensor(d["logits"]).half(),
        torch.as_tensor(d["w"]).half(),
        torch.as_tensor(d["n"]).short(),
        torch.full((B,), c_puct).half(),
        torch.as_tensor(d["seats"]).short(),
        torch.as_tensor(d["terminal"]),
        torch.as_tensor(d["children"]).short(),
    )


@needs_engines
@pytest.mark.parametrize("seed", [0, 1])
def test_mcts_root_parity(seed):
    rng = np.random.default_rng(seed)
    B, T, A, S = 64, 12, 5, 2
    d = _random_tree(rng, B, T, A, S)
    c_puct = float(rng.uniform(0.05, 2.0))

    ours = np.exp(np.asarray(jax.jit(M.root)(_to_jax_tree(d, c_puct))["logits"]))
    ref = _mcts.root(_to_ref_mcts(d, c_puct)).float().numpy()

    # the reference computes in fp16; agree to fp16-ish tolerance
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


@needs_engines
def test_mcts_backup_parity():
    rng = np.random.default_rng(7)
    B, T, A, S = 32, 12, 5, 2
    d = _random_tree(rng, B, T, A, S)

    leaves = rng.integers(0, T, B)
    v = rng.normal(0, 1, (T, S))
    rewards = rng.normal(0, 0.5, (T, S))
    vB = np.broadcast_to(v[None], (B, T, S)).copy()
    rB = np.broadcast_to(rewards[None], (B, T, S)).copy()

    tree = _to_jax_tree(d, 1.0).replace(
        v=jnp.asarray(vB, jnp.float32), rewards=jnp.asarray(rB, jnp.float32)
    )
    # reference increments n once per seat (the lambda_N quirk) — ours
    # replicates with n_per_visit = S
    out = jax.jit(M.backup, static_argnums=2)(tree, jnp.asarray(leaves, jnp.int32), S)

    ref_v = torch.as_tensor(vB).half()
    ref_w = torch.as_tensor(d["w"]).half()
    ref_n = torch.as_tensor(d["n"]).short()
    bk = _mcts.Backup(
        ref_v, ref_w, ref_n,
        torch.as_tensor(rB).half(),
        torch.as_tensor(d["parents"]).short(),
        torch.as_tensor(d["terminal"]),
    )
    _mcts.backup(bk, torch.as_tensor(leaves).short())

    np.testing.assert_array_equal(np.asarray(out.n), ref_n.numpy())
    np.testing.assert_allclose(np.asarray(out.w), ref_w.float().numpy(), rtol=2e-2, atol=2e-2)
