"""Active matchmaking: which pair gains the most rating information?

Reference counterpart: activelo/suggestions.py — the expected information
gain of one more game between a pair is sigma_d^2 * 1/(1/e + 2 + e), a rank-1
information-update heuristic (suggestions.py:17-24).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def improvement(soln):
    mud, sigmad = soln.mud, soln.sigmad
    if isinstance(mud, pd.DataFrame):
        e = np.exp(-mud)
        return sigmad ** 2 * (1 / (1 / e + 2 + e))
    e = np.exp(-np.asarray(mud))
    return np.asarray(sigmad) ** 2 / (1 / e + 2 + e)


def suggest(soln):
    """The (row, col) pair — names when pandas-backed — with the highest
    expected information gain (reference suggestions.py:26-31)."""
    imp = improvement(soln)
    if isinstance(imp, pd.DataFrame):
        arr = imp.values
        row, col = np.unravel_index(np.nanargmax(arr), arr.shape)
        return imp.index[row], imp.columns[col]
    row, col = np.unravel_index(np.nanargmax(imp), imp.shape)
    return row, col
