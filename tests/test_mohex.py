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
