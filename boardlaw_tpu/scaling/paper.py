"""Paper figures: compute-vs-Elo curves, frontiers, residual variance.

Reference counterpart: analysis/paper.py (plotnine IEEE figures) — rendered
here with plain matplotlib. Each function takes the `load()`ed agents frame
and returns a matplotlib Figure.
"""
from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np

from . import data


def flops_curves(ags, ax=None):
    """Per-run Elo-vs-train-FLOPs curves, one panel color per boardsize
    (reference analysis/paper.py flops plots)."""
    ax = plt.subplots(figsize=(7, 4))[1] if ax is None else ax
    for b, g in ags.groupby("boardsize"):
        for run, gg in g.groupby("run"):
            gg = gg.sort_values("train_flops")
            ax.plot(
                gg.train_flops, data.ELO * gg.elo, alpha=0.4,
                color=plt.cm.viridis((b - 3) / 7),
            )
    ax.set_xscale("log")
    ax.set_xlabel("train FLOPs")
    ax.set_ylabel("Elo vs best (base-10/400)")
    ax.grid(alpha=0.25)
    return ax.figure


def frontiers(ags, ax=None):
    """Upper-envelope frontier per boardsize plus the fitted changepoint
    model."""
    ax = plt.subplots(figsize=(7, 4))[1] if ax is None else ax
    df, params = data.modelled_elos(ags)
    for b, g in df.groupby("boardsize"):
        color = plt.cm.viridis((b - 3) / 7)
        ax.plot(g.train_flops, data.ELO * g.elo, color=color, label=f"{b}x{b}")
        ax.plot(g.train_flops, data.ELO * g.elohat, color=color, linestyle="--")
    ax.set_xscale("log")
    ax.set_xlabel("train FLOPs")
    ax.set_ylabel("frontier Elo")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.25)
    return ax.figure


def resid_var(ags, ax=None):
    """Residual variance of the frontier fit by boardsize."""
    ax = plt.subplots(figsize=(5, 3))[1] if ax is None else ax
    df, params = data.modelled_elos(ags)
    resid = (df.elo - df.elohat).groupby(df.boardsize).apply(lambda s: (s ** 2).mean())
    var = df.elo.groupby(df.boardsize).var()
    (resid / var).plot.bar(ax=ax)
    ax.set_ylabel("resid var fraction")
    return ax.figure


def perfect_play_flops(ags, ax=None):
    """Extrapolated FLOPs to perfect play per boardsize."""
    ax = plt.subplots(figsize=(5, 3))[1] if ax is None else ax
    df, params = data.modelled_elos(ags)
    perfect = data.perfect_play(params)
    ax.plot(perfect.index, perfect.values, marker="o")
    ax.set_xlabel("boardsize")
    ax.set_ylabel("log10 FLOPs to perfect play")
    ax.grid(alpha=0.25)
    return ax.figure
