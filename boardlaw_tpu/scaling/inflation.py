"""Elo-inflation sanity check: are later agents' ratings drifting relative to
a fixed early anchor set?

Reference counterpart: analysis/inflation.py — solve Elos on an early subset
of trials and on the full set, and compare the shared agents' ratings.
"""
from __future__ import annotations

import pandas as pd

from .. import elos, sql


def inflation(boardsize, split=0.5):
    trials = sql.trial_query(boardsize)
    if len(trials) < 4:
        return pd.DataFrame(columns=["early", "late", "drift"])
    cut = int(len(trials) * split)
    early_trials, all_trials = trials.iloc[:cut], trials

    we, ge = elos.symmetrize(early_trials)
    wa, ga = elos.symmetrize(all_trials)
    early = elos.solve(we, ge)
    late = elos.solve(wa, ga).reindex(early.index)

    out = pd.DataFrame({"early": early, "late": late})
    out["drift"] = out.late - out.early
    return out.dropna()
