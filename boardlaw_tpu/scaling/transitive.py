"""Transitivity check: do head-to-head results respect the solved ratings?

Reference counterpart: analysis/transitive.py — for each pair, compare the
empirical winrate with the winrate implied by the Elo difference; large
residuals flag non-transitive triangles.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .. import elos, sql


def residuals(boardsize):
    trials = sql.trial_query(boardsize)
    if len(trials) == 0:
        return pd.DataFrame()
    ws, gs = elos.symmetrize(trials)
    r = elos.solve(ws, gs)

    rates = (ws / gs).reindex(index=r.index, columns=r.index)
    diffs = pd.DataFrame(r.values[:, None] - r.values[None, :], r.index, r.index)
    implied = 1 / (1 + np.exp(-diffs))
    return (rates - implied).where(gs > 0)


def worst_triangles(boardsize, k=10):
    res = residuals(boardsize)
    if res.empty:
        return pd.Series(dtype=float)
    return res.abs().stack().sort_values(ascending=False).head(k)
