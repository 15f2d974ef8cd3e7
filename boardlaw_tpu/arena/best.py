"""Top-agent targeted evaluation: extra games against each boardsize's best
agent until rating uncertainty is low.

Reference counterpart: boardlaw/arena/best.py — per-boardsize TOPS/MIDS
anchor tables (:8-24), uniform refills of unseen challengers (:46-60), and a
beta-posterior std stopping rule (:63-84).
"""
from __future__ import annotations

from logging import getLogger

import numpy as np
import pandas as pd
import scipy.special

from .. import elos, sql
from . import common

log = getLogger(__name__)


def frontier_participants(ags, boardsize):
    """Agents on (or bracketing) the compute frontier of a boardsize
    (reference best.py:26-43)."""
    from ..scaling import data

    ags = ags.loc[lambda df: df.boardsize == boardsize]
    if len(ags) == 0:
        return []
    ys = data.interp_curves(ags)

    selection = []
    for flops, r in ys.iterrows():
        run = r.idxmax()
        snaps = ags.loc[ags.run == run].sort_values("train_flops")
        dists = np.log10(snaps.train_flops) - np.log10(flops)
        if (dists == 0).any():
            selection.append((dists == 0).idxmax())
        else:
            if (dists < 0).any():
                selection.append(dists[dists < 0].index[-1])
            if (dists > 0).any():
                selection.append(dists[dists > 0].index[0])
    return list(set(selection))


def top_agent(boardsize):
    """Highest-Elo agent of a boardsize from current trials."""
    trials = sql.trial_query(boardsize)
    if len(trials) == 0:
        return None
    ws, gs = elos.symmetrize(trials)
    return elos.solve(ws, gs).idxmax()


def rating_std(wins, losses):
    """Beta-posterior std of the log-odds rating gap (reference
    best.py:63-75)."""
    m, n = wins, losses
    return (scipy.special.polygamma(1, m + 1) + scipy.special.polygamma(1, n + 1)) ** 0.5


def std_available(boardsize, max_std=0.5, max_games=512 * 1024):
    """Challenger agents whose rating gap to the top agent is still too
    uncertain (reference best.py:63-84)."""
    top = top_agent(boardsize)
    if top is None:
        return pd.DataFrame(columns=["std", "games"])
    trials = sql.trial_query(boardsize)
    ws, gs = elos.symmetrize(trials)
    others = [a for a in ws.index if a != top]
    rows = []
    for a in others:
        w = ws.loc[top, a] if a in ws.columns else 0.0
        g = gs.loc[top, a] if a in gs.columns else 0.0
        w = 0.0 if pd.isna(w) else w
        g = 0.0 if pd.isna(g) else g
        std = rating_std(w, g - w)
        if std > max_std and g < max_games:
            rows.append({"agent": a, "std": std, "games": g})
    return pd.DataFrame(rows).sort_values("std", ascending=False) if rows else pd.DataFrame(columns=["agent", "std", "games"])


def evaluate(boardsize, n_envs=64, rounds=8, seed=0):
    """Play the most-uncertain challengers against the top agent until the
    std rule is satisfied or `rounds` exhausted (reference best.py:86-126)."""
    import jax

    for rnd in range(rounds):
        avail = std_available(boardsize)
        if len(avail) == 0:
            break
        top = top_agent(boardsize)
        challenger = avail.iloc[0].agent
        top_ag = common.sql_agent(top)
        ch_ag = common.sql_agent(challenger)
        world = common.sql_world(top, n_envs)
        results = common.evaluate(
            world, {str(top): top_ag, str(challenger): ch_ag},
            key=jax.random.PRNGKey(seed + rnd),
        )
        rows = []
        for r in results:
            black, white = r["names"]
            rows.append(
                (int(black), int(white), r["wins"][0], r["wins"][1], r["moves"], r["times"])
            )
        sql.save_trials(rows)
        log.info(f"best-eval round {rnd}: {top} vs {challenger}")
