"""Arena posterior analysis and plots.

Reference counterpart: boardlaw/arena/live/analysis.py (posterior-to-pandas,
Elo differences with uncertainty, :14-43) and live/plot.py (error-bar,
heatmap and nontransitivity figures).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .. import activelo
from . import live


def solution(run, names=None):
    """Solve the posterior over a run's arena ledger."""
    trials = live.ledger_trials(run)
    if names is None:
        names = sorted(set(trials.black_agent) | set(trials.white_agent))
    n, w = live.symmetric_counts(trials, names)
    return activelo.solve(n, w)


def difference(soln, a, b):
    """(mean, std) of the Elo gap between two agents, using the full
    covariance (reference live/analysis.py:14-21)."""
    mu = soln.mu
    Sigma = soln.Sigma
    d = mu[a] - mu[b]
    var = Sigma.loc[a, a] - Sigma.loc[a, b] - Sigma.loc[b, a] + Sigma.loc[b, b]
    return float(d), float(np.sqrt(max(var, 0)))


def elos(run, names=None):
    """Posterior means/stds as a dataframe (reference live/analysis.py:28-43)."""
    soln = solution(run, names)
    mu = soln.mu
    sigma = pd.Series(np.sqrt(np.diagonal(soln.Sigma.values)), mu.index)
    return pd.DataFrame({"elo": mu, "std": sigma}).sort_values("elo", ascending=False)


def errorbars(run, ax=None):
    """Elo point estimates with ±2 sigma bars (reference live/plot.py)."""
    import matplotlib.pyplot as plt

    df = elos(run)
    ax = plt.subplots()[1] if ax is None else ax
    ax.errorbar(np.arange(len(df)), df.elo, yerr=2 * df["std"], fmt="o")
    ax.set_xticks(np.arange(len(df)))
    ax.set_xticklabels(df.index, rotation=45, ha="right", fontsize=8)
    ax.set_ylabel("Elo (nats)")
    ax.grid(alpha=0.25)
    return ax.figure


def winrate_heatmap(run, ax=None):
    """Pairwise empirical winrates (reference live/plot.py heatmap)."""
    import matplotlib.pyplot as plt

    trials = live.ledger_trials(run)
    names = sorted(set(trials.black_agent) | set(trials.white_agent))
    n, w = live.symmetric_counts(trials, names)
    rate = (w / n).values

    ax = plt.subplots()[1] if ax is None else ax
    im = ax.imshow(rate, vmin=0, vmax=1, cmap="RdBu")
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ax.set_yticklabels(names, fontsize=7)
    ax.figure.colorbar(im, ax=ax, label="winrate")
    return ax.figure


def nontransitivity(run, ax=None):
    """Residual |empirical - implied| winrates (reference live/plot.py)."""
    import matplotlib.pyplot as plt

    soln = solution(run)
    trials = live.ledger_trials(run)
    names = list(soln.mu.index)
    n, w = live.symmetric_counts(trials, names)
    rates = (w / n).values
    implied = 1 / (1 + np.exp(-(soln.mu.values[:, None] - soln.mu.values[None, :])))
    resid = np.abs(rates - implied)

    ax = plt.subplots()[1] if ax is None else ax
    im = ax.imshow(resid, vmin=0, vmax=0.5, cmap="viridis")
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ax.set_yticklabels(names, fontsize=7)
    ax.figure.colorbar(im, ax=ax, label="|empirical - implied|")
    return ax.figure
