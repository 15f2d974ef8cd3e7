"""Hex environment tests.

Ports the reference's test strategy (SURVEY.md §4.3): cell-level transition
tests on tokened 3x3 boards (boardlaw/hex/tests.py:58-93), historical-bug
regressions (hex/__init__.py:274-295), ASCII replay (hex/tests.py:121-134),
and random-game equivalence vs an independent golden implementation (the
reference uses OpenSpiel, hex/tests.py:155-184).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boardlaw_tpu.envs import hex
from boardlaw_tpu.envs.hex import EMPTY, BLACK, WHITE, TOP, BOT, LEFT, RIGHT, Hex
from golden_hex import GoldenHex

B, W = 0, 1
# 3x3 cell indices
TL, TC, TR, CL, CC, CR, BL, BC, BR = range(9)


def empty_board():
    return np.zeros((1, 3, 3), np.uint8)


def tokened_board(*moves):
    board = empty_board()
    for ij, v in moves:
        board[:, ij // 3, ij % 3] = v
    return board


_step_noreset = jax.jit(lambda w, a: w.step(a, reset=False))


def apply(seat, action, board):
    world = Hex(board=jnp.asarray(board), seats=jnp.full((1,), seat, jnp.int32))
    new, transition = _step_noreset(world, jnp.array([action]))
    return np.asarray(new.board), np.asarray(transition.rewards[0])


def check_move(seat, action, initial, expected):
    board, rewards = apply(seat, action, initial)
    np.testing.assert_array_equal(board, expected)
    np.testing.assert_array_equal(rewards, np.zeros(2))


def test_single_moves():
    # Black
    check_move(B, CC, empty_board(), tokened_board((CC, BLACK)))
    check_move(B, TL, empty_board(), tokened_board((TL, TOP)))
    check_move(B, BR, empty_board(), tokened_board((BR, BOT)))
    check_move(B, TR, empty_board(), tokened_board((TR, TOP)))  # not mirrored

    # White — mirrored frame
    check_move(W, CC, empty_board(), tokened_board((CC, WHITE)))
    check_move(W, TL, empty_board(), tokened_board((TL, LEFT)))
    check_move(W, BR, empty_board(), tokened_board((BR, RIGHT)))
    check_move(W, TR, empty_board(), tokened_board((BL, LEFT)))  # mirrored


def test_wins():
    board = tokened_board((TC, TOP), (BC, BOT))
    _, rewards = apply(B, CC, board)
    np.testing.assert_array_equal(rewards, [+1.0, -1.0])

    board = tokened_board((CL, LEFT), (CR, RIGHT))
    _, rewards = apply(W, CC, board)
    np.testing.assert_array_equal(rewards, [-1.0, +1.0])


def test_flooding():
    initial = tokened_board((CL, BLACK), (CC, BLACK))
    expected = tokened_board((CL, BOT), (CC, BOT), (BC, BOT))
    check_move(B, BC, initial, expected)

    initial = tokened_board((TC, WHITE), (CC, WHITE))
    expected = tokened_board((TC, LEFT), (CC, LEFT), (CL, LEFT))
    check_move(W, TC, initial, expected)


def test_bug():
    # Regression: reference hex/__init__.py:274-282
    world = Hex.initial(n_envs=1, boardsize=3)
    for a in [5, 5, 6, 1]:
        world, _ = world.step(jnp.array([a]))
    np.testing.assert_array_equal(
        np.asarray(world.board[0]),
        [[0, 0, 0], [5, 0, 1], [4, 2, 0]],
    )


def test_bug_2():
    # Regression: reference hex/__init__.py:284-295
    world = Hex(
        board=jnp.asarray([[[0, 6, 6], [1, 1, 1], [0, 2, 0]]], jnp.uint8),
        seats=jnp.zeros((1,), jnp.int32),
    )
    world, _ = world.step(jnp.array([6]), reset=False)
    np.testing.assert_array_equal(
        np.asarray(world.board[0]),
        [[0, 6, 6], [4, 4, 4], [4, 2, 0]],
    )


def test_from_string():
    world = hex.from_string("""
    bwb
    wbw
    ...
    """)
    board = np.asarray(world.board[0])
    # Top row cells connect to the top edge for black; mirrored for white
    assert board[2].tolist() == [0, 0, 0]
    assert (board != 0).sum() == 6


def test_auto_reset():
    # A winning move must reset the board and hand the move to black
    board = tokened_board((TC, TOP), (BC, BOT))
    world = Hex(board=jnp.asarray(board), seats=jnp.zeros((1,), jnp.int32))
    world, transition = world.step(jnp.array([CC]))
    assert bool(transition.terminal[0])
    np.testing.assert_array_equal(np.asarray(world.board[0]), np.zeros((3, 3)))
    assert int(world.seats[0]) == 0


def test_valid_mask_frames():
    world = Hex.initial(n_envs=1, boardsize=3)
    world, _ = world.step(jnp.array([TC]))  # black takes top-centre (0,1)
    # White's frame is transposed: cell (0,1) black occupies appears at (1,0)
    valid = np.asarray(world.valid[0]).reshape(3, 3)
    assert not valid[1, 0]
    assert valid[0, 1]


@pytest.mark.parametrize("boardsize", [3, 5, 7])
def test_golden_equivalence(boardsize):
    """Random games vs the independent golden model: boards, observations,
    rewards and terminals must agree at every ply."""
    rng = np.random.default_rng(2026)
    n_envs = 8
    world = Hex.initial(n_envs=n_envs, boardsize=boardsize)
    golden = [GoldenHex(boardsize) for _ in range(n_envs)]

    step = jax.jit(lambda w, a: w.step(a))
    probe = jax.jit(lambda w: (w.obs, w.valid))

    for ply in range(120):
        obs, valid = jax.tree.map(np.asarray, probe(world))
        actions = []
        for e in range(n_envs):
            gv = golden[e].valid()
            np.testing.assert_array_equal(valid[e], gv, err_msg=f"valid mismatch env {e} ply {ply}")
            np.testing.assert_array_equal(obs[e], golden[e].obs(), err_msg=f"obs mismatch env {e} ply {ply}")
            actions.append(rng.choice(np.flatnonzero(gv)))
        actions = np.array(actions)

        world, transition = step(world, jnp.asarray(actions))
        terminal, rewards = np.asarray(transition.terminal), np.asarray(transition.rewards)
        for e in range(n_envs):
            g_terminal, g_rewards = golden[e].step(actions[e])
            assert bool(terminal[e]) == g_terminal, f"terminal mismatch env {e} ply {ply}"
            np.testing.assert_array_equal(rewards[e], g_rewards, err_msg=f"reward mismatch env {e} ply {ply}")


def test_lazy_solitaire():
    world = hex.Lazy.initial(n_envs=2, boardsize=3)
    assert world.n_seats == 1
    world, transition = world.step(jnp.array([CC, CC]))
    # The opponent (white) should have taken the first valid cell in its frame
    assert transition.rewards.shape == (2, 1)
    assert (np.asarray(world.board) != 0).sum(axis=(1, 2)).tolist() == [2, 2]
    assert np.asarray(world.seats).tolist() == [0, 0]


def test_random_solitaire():
    @jax.jit
    def tick(world, key):
        k1, k2 = jax.random.split(key)
        logits = jnp.where(world.valid, 0.0, -jnp.inf)
        actions = jax.random.categorical(k1, logits, axis=-1)
        return world.step(actions, key=k2)

    key = jax.random.PRNGKey(0)
    world = hex.Random.initial(n_envs=32, boardsize=3)
    total = np.zeros(32)
    for t in range(20):
        key, sub = jax.random.split(key)
        world, transition = tick(world, sub)
        total += np.asarray(transition.rewards[:, 0])
    assert np.all(np.abs(total) <= 20)
    # games do finish
    assert np.any(total != 0)
