"""MoHex GTP plumbing tests against a scripted stub engine (no real MoHex
binary needed)."""
import os
import sys

import jax
import numpy as np
import pytest

from boardlaw_tpu import mohex
from boardlaw_tpu.envs import hex

STUB = f"{sys.executable} {os.path.join(os.path.dirname(__file__), 'gtp_stub.py')}"


def test_notation():
    assert mohex.to_notation((0, 0)) == "a1"
    assert mohex.to_notation((2, 3)) == "d3"
    assert mohex.from_notation("d3") == (2, 3)


def test_sgf():
    world = hex.Hex.initial(1, 3)
    world, _ = world.step(jax.numpy.array([4]))  # black centre
    sgf = mohex.as_sgf(np.asarray(world.obs[0]), 1)  # white's view
    assert "SZ[3]" in sgf
    assert "B[b2]" in sgf  # centre in black frame


def test_gtp_conversation():
    gtp = mohex.MoHex(command=STUB)
    gtp.boardsize(3)
    gtp.play("b", (0, 0))
    move = gtp.solve("w")
    assert move == (0, 1)  # first free cell after a1 is b1 -> (row 0, col 1)
    gtp.clear()
    assert gtp.solve("b") == (0, 0)
    gtp.close()


def test_mohex_agent_plays_valid():
    world = hex.Hex.initial(2, 3)
    agent = mohex.MoHexAgent(command=STUB, max_proxies=2)
    key = jax.random.PRNGKey(0)
    for ply in range(4):
        key, sub = jax.random.split(key)
        decisions = agent(world, sub)
        valid = np.asarray(world.valid)
        acts = np.asarray(decisions["actions"])
        assert all(valid[e, acts[e]] for e in range(2)), f"invalid move at ply {ply}"
        world, _ = world.step(decisions["actions"])
    agent.close()


def test_random_blend():
    world = hex.Hex.initial(2, 3)
    agent = mohex.MoHexAgent(command=STUB, max_proxies=2, random=1.0)
    decisions = agent(world, jax.random.PRNGKey(1))
    valid = np.asarray(world.valid)
    acts = np.asarray(decisions["actions"])
    assert all(valid[e, acts[e]] for e in range(2))
    # fully random: no proxies should ever have been spawned
    assert agent._proxies == []
    agent.close()


def test_available_detection():
    assert isinstance(mohex.available(), bool)


def test_seat1_notation_golden():
    """Golden seat-1 round trip (r1 VERDICT weak #7): with black on a1, the
    stub answers b1 in BLACK's frame — (row 0, col 1) on the stored board.
    White acts in the TRANSPOSED frame, so the agent must emit action
    S*col + row = 3, and stepping it must place a white stone at board cell
    (0, 1)."""
    world = hex.Hex.initial(1, 3)
    world, _ = world.step(jax.numpy.array([0]))  # black a1 -> seat 1 to act
    assert int(world.seats[0]) == 1

    agent = mohex.MoHexAgent(command=STUB, max_proxies=1, random=0.0)
    decisions = agent(world, jax.random.PRNGKey(0))
    act = int(np.asarray(decisions["actions"])[0])
    assert act == 3  # white frame: row = 3 % 3 = 0, col = 3 // 3 = 1

    stepped, _ = world.step(decisions["actions"])
    board = np.asarray(stepped.board[0])
    assert board[0, 0] in (hex.BLACK, hex.TOP, hex.BOT)  # black's stone intact
    assert board[0, 1] in (hex.WHITE, hex.LEFT, hex.RIGHT)  # white landed on b1
    agent.close()


def test_seat1_sgf_transposed_golden():
    """A transposed scripted board round-trips exactly: black b2+c1, white a3.
    In white's observation the planes are swapped and transposed; as_sgf must
    reconstruct the BLACK-frame stones verbatim."""
    world = hex.Hex.initial(1, 3)
    for a in [1 * 3 + 1, 3 * 0 + 2, 0 * 3 + 2]:
        # black b2 (r1,c1); white acting in transposed frame: action 2 ->
        # (row 2, col 0) on the board = a3; black c1 (r0,c2)
        world, _ = world.step(jax.numpy.array([a]))
    board = np.asarray(world.board[0])
    assert board[1, 1] in (hex.BLACK, hex.TOP, hex.BOT)
    assert board[2, 0] in (hex.WHITE, hex.LEFT, hex.RIGHT)
    assert board[0, 2] in (hex.BLACK, hex.TOP, hex.BOT)
    assert int(world.seats[0]) == 1  # white to act

    sgf = mohex.as_sgf(np.asarray(world.obs[0]), seat=1)
    assert "B[b2]" in sgf and "B[c1]" in sgf and "W[a3]" in sgf
