"""Calibration of top agents against MoHex over all distinct openings.

Reference counterpart: boardlaw/arena/mohex.py — enumerate all distinct
2-ply openings (mohex.py:13-26), label them with MoHex-vs-MoHex perfect play
(cached, :41-58), and run agent-vs-MoHex trials into the results DB
(:71-106).
"""
from __future__ import annotations

import json
from logging import getLogger
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .. import mohex, sql
from ..envs import hex
from . import common

log = getLogger(__name__)

DATA = Path("output/experiments/mohex.json")


def initial_states(boardsize=7):
    """All 2-ply openings that are distinct up to white's frame transposition
    (reference arena/mohex.py:13-26)."""
    count = boardsize ** 4
    first = np.arange(count) // boardsize ** 2
    second = np.arange(count) % boardsize ** 2

    rows, cols = first // boardsize, first % boardsize
    transposed = cols * boardsize + rows
    mask = transposed != second

    world = hex.Hex.initial(int(mask.sum()), boardsize)
    world, _ = world.step(jnp.asarray(first[mask], jnp.int32))
    world, _ = world.step(jnp.asarray(second[mask], jnp.int32))
    return world


def play_out(world, agents, key=None, max_plies=None):
    """Play fixed seats to terminal; returns winner seat per env (reference
    arena/mohex.py:28-39)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    B = world.n_envs
    done = np.zeros(B, bool)
    winners = np.full(B, -1)
    max_plies = max_plies or 2 * world.boardsize ** 2

    from .. import utils

    for _ in range(max_plies):
        if done.all():
            break
        seats = np.asarray(world.seats)
        for i, agent in enumerate(agents):
            mask = (seats == i) & ~done
            if not mask.any():
                continue
            key, sub = jax.random.split(key)
            decisions = agent(world, sub, eval=True)
            stepped, tr = world.step(decisions["actions"])
            world = utils.where(jnp.asarray(mask), stepped, world)
            terminal = np.asarray(tr.terminal) & mask
            rewards = np.asarray(tr.rewards)
            winners[terminal] = rewards[terminal].argmax(-1)
            done |= terminal
            seats = np.asarray(world.seats)
    return winners


def reference_wins(boardsize=7, chunk=8):
    """Perfect-play-ish labels for every opening from MoHex self-play, cached
    to disk (reference arena/mohex.py:41-58). Requires the MoHex binary."""
    DATA.parent.mkdir(parents=True, exist_ok=True)
    if DATA.exists():
        return np.asarray(json.loads(DATA.read_text()), int)
    if not mohex.available():
        raise RuntimeError("MoHex binary not available; cannot build reference wins")

    world = initial_states(boardsize)
    agent = mohex.MoHexAgent()
    wins = np.full(world.n_envs, -1)
    for i in range(0, world.n_envs, chunk):
        import jax

        sub = jax.tree.map(lambda x: x[i : i + chunk], world)
        wins[i : i + chunk] = play_out(sub, [agent, agent])
    DATA.write_text(json.dumps([int(w) for w in wins]))
    return wins


def calibrate(agent_id, n_envs=16, **mohex_kwargs):
    """Agent-vs-MoHex trials saved to the DB (reference arena/mohex.py:71-106)."""
    if not mohex.available():
        raise RuntimeError("MoHex binary not available")
    row = sql.agent_query().loc[agent_id]
    ag = common.sql_agent(agent_id)
    world = hex.Hex.initial(n_envs, int(row.boardsize))
    mhx = mohex.MoHexAgent(**mohex_kwargs)
    results = common.evaluate(world, {"agent": ag, "mohex": mhx})
    rows = []
    for r in results:
        black, white = r["names"]
        rows.append(
            (
                agent_id if black == "agent" else None,
                agent_id if white == "agent" else None,
                r["wins"][0],
                r["wins"][1],
                r["moves"],
                r["times"],
            )
        )
    sql.save_mohex_trials(rows)
    return results


def calibrations(boardsize):
    """Winrates vs MoHex per agent (reference arena/mohex.py:108-131)."""
    trials = sql.mohex_trial_query()
    if len(trials) == 0:
        return pd.DataFrame(columns=["agent_id", "winrate", "games"])
    rows = []
    for aid in set(trials.black_agent.dropna()) | set(trials.white_agent.dropna()):
        as_black = trials[trials.black_agent == aid]
        as_white = trials[trials.white_agent == aid]
        wins = as_black.black_wins.sum() + as_white.white_wins.sum()
        games = (
            as_black.black_wins.sum()
            + as_black.white_wins.sum()
            + as_white.black_wins.sum()
            + as_white.white_wins.sum()
        )
        rows.append({"agent_id": aid, "winrate": wins / max(games, 1), "games": games})
    return pd.DataFrame(rows)


def best_agent(boardsize):
    c = calibrations(boardsize)
    if len(c) == 0:
        return None
    return c.sort_values("winrate").agent_id.iloc[-1]
