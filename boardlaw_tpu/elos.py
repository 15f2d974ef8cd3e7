"""Maximum-likelihood Elo solver.

Reference counterpart: boardlaw/elos.py — fold black/white trials into
symmetric win/game matrices, then L-BFGS MLE of Bradley-Terry ratings with a
small L2 anchor, reported relative to the best agent.

JAX-native: the loss is a pure function; scipy's L-BFGS drives
`jax.value_and_grad` (the problem is host-scale: N agents, not N envs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import scipy.optimize


def symmetrize(trials):
    """Fold per-(black, white) trial counts into symmetric wins/games
    matrices (reference elos.py:5-21).

    trials: DataFrame with columns black_agent, white_agent, black_wins,
    white_wins.
    """
    if len(trials) == 0:
        ws = pd.DataFrame(0.0, index=trials.index, columns=trials.index)
        gs = pd.DataFrame(0.0, index=trials.index, columns=trials.index)
        return ws, gs

    df = (
        trials.assign(games=lambda df: df.black_wins + df.white_wins)
        .groupby(["black_agent", "white_agent"])[["games", "white_wins", "black_wins"]]
        .sum()
        .unstack()
    )
    ids = sorted(set(df.columns.get_level_values(1)) | set(df.index))
    df = df.reindex(index=ids).reindex(columns=ids, level=1).fillna(0)

    games = df.games + df.games.T
    ws = (df.black_wins / df.games + df.white_wins.T / df.games.T) / 2 * games
    return ws.where(games > 0, np.nan), games


def solve(wins, games, prior=1.0):
    """MLE Bradley-Terry ratings in natural-log units, anchored to the best
    agent at 0 (reference elos.py:23-57)."""
    pd.testing.assert_index_equal(wins.index, games.index)
    pd.testing.assert_index_equal(wins.index, wins.columns, check_names=False)

    W = jnp.asarray(wins.fillna(0).values) + prior
    N = jnp.asarray(games.fillna(0).values) + 2 * prior
    mask = jnp.asarray(games.gt(0).values)

    n = W.shape[0]

    def loss(r):
        d = r[:, None] - r[None, :]
        s = jax.nn.sigmoid(d)
        l = W * jnp.log(s) + (N - W) * jnp.log1p(-s)
        denom = jnp.maximum(mask.sum(), 1)
        return -(jnp.where(mask, l, 0.0).sum() / denom) + 0.01 * jnp.square(r.mean())

    vg = jax.jit(jax.value_and_grad(loss))

    def f(r):
        v, g = vg(jnp.asarray(r))
        return float(v), np.asarray(g, np.float64)

    res = scipy.optimize.minimize(f, np.zeros(n), jac=True, method="L-BFGS-B")
    r = res.x
    return pd.Series(r - r.max(), wins.index, name="elo")


def elo_errors(elos, trials):
    """Max |empirical - implied| winrate residual per agent (reference
    elos.py:59-69)."""
    ws, gs = symmetrize(trials)
    ws = ws.reindex(index=elos.index, columns=elos.index)
    gs = gs.reindex(index=elos.index, columns=elos.index)
    rates = ws / gs

    diffs = pd.DataFrame(
        elos.values[:, None] - elos.values[None, :], elos.index, elos.index
    )
    expected = 1 / (1 + np.exp(-diffs))
    err = (rates - expected).abs()
    return pd.concat([err.max(), err.T.max()], axis=1).max(axis=1)
