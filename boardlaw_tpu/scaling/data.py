"""Compute-frontier analysis: assemble agents+Elos, interpolate per-run
curves, fit the frontier model, extrapolate perfect play.

Reference counterpart: analysis/data.py — `load()` joins the agents_details
view to per-boardsize Elo solutions (:37-45); `interp_curves`/
`interp_frontier` resample each run's (train_flops, elo) curve onto a common
log-flops grid and take the upper envelope (:59-71); the `Changepoint` model
fits elo = clamp(max(incline(flops, boardsize), plateau(boardsize)), 0)
(:73-124); `perfect_play` bisects it for the flops needed to reach a target
Elo (:130-135).

The model fits are jax.grad + scipy L-BFGS (host-scale data).
"""
from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pandas as pd
import scipy.optimize

from .. import elos, sql

# Internal Elos are in nats; public Elos are base 10^(d/400)
ELO = 400 / np.log(10)

GLOBAL_GAMES = 1024


def trial_elos(boardsize, desc=None):
    """Per-boardsize MLE Elos from the trials table (reference
    analysis/data.py:19-34)."""
    trials = sql.trial_query(boardsize, desc)
    if len(trials) == 0:
        return pd.Series(dtype=float, name="elo")
    ws, gs = elos.symmetrize(trials)
    return elos.solve(ws, gs)


def load(desc=None):
    """Master frame: agents_details joined to Elos (reference
    analysis/data.py:37-45)."""
    ags = sql.agent_query()
    es = []
    for b in sorted(ags.boardsize.dropna().unique()):
        es.append(trial_elos(int(b), desc))
    if not es:
        return ags.iloc[:0]
    es = pd.concat(es)
    return ags.join(es, how="inner")


def interp_curves(g, x="train_flops", y="elo", group="run"):
    """Each run's curve interpolated onto a common log-x grid (reference
    analysis/data.py:59-67)."""
    xl, xr = np.log10(g[x]).min(), np.log10(g[x]).max()
    xs = np.linspace(xl, xr, 101)
    ys = {}
    for run, gg in g.sort_values(x).groupby(group):
        xp = np.log10(gg[x].values)
        yp = gg[y].values
        ys[run] = np.interp(xs, xp, yp, np.nan, np.nan)
    return pd.DataFrame(ys, index=10 ** xs)


def interp_frontier(g, x="train_flops", y="elo", **kwargs):
    """Upper envelope over runs (reference analysis/data.py:69-71)."""
    ys = interp_curves(g, x=x, y=y, **kwargs)
    return ys.ffill().max(1).rename_axis(index=x).rename(y)


# -- frontier models --------------------------------------------------------

def changepoint_init():
    return {
        "plateau": jnp.array([-1.5, 3.0]),  # boardsize, offset
        "incline": jnp.array([2.0, -2.0, -16.0]),  # log-flops, boardsize, offset
    }


# Feature centering: raw inputs are [log10 flops, boardsize]; fitting in a
# centered basis keeps all parameters O(1) and the least-squares valley round
# (the reference fits in the raw basis and leans on LBFGS restarts).
_CENTER = jnp.array([12.0, 6.0])


def changepoint_apply(params, X):
    """elo = min(max(incline, plateau), 0) (reference analysis/data.py:73-88)."""
    Xc = X - _CENTER
    ones = jnp.ones_like(Xc[:, :1])
    Xa = jnp.concatenate([Xc, ones], -1)
    plateau = Xa[:, 1:] @ params["plateau"]
    incline = Xa @ params["incline"]
    return jnp.clip(jnp.maximum(incline, plateau), None, 0.0)


def sigmoid_init():
    return {
        "scale": jnp.array([1 / 16.0, 0.0]),
        "height": jnp.array(1.3),
        "center": jnp.array([0.66, 9.0]),
    }


def sigmoid_apply(params, X):
    """Alternative saturating frontier (reference analysis/data.py:90-103)."""
    Xc = X - _CENTER
    ones = jnp.ones_like(Xc[:, :1])
    Xa = jnp.concatenate([Xc, ones], -1)
    hscale = Xa[:, 1:] @ params["scale"]
    vscale = hscale * params["height"]
    center = Xa[:, 1:] @ params["center"]
    return vscale * (jax.nn.sigmoid((Xa[:, 0] - center) / hscale) - 1)


def model_inputs(df):
    return jnp.stack(
        [
            jnp.log10(jnp.asarray(df.train_flops.values, jnp.float32)),
            jnp.asarray(df.boardsize.values, jnp.float32),
        ],
        -1,
    )


def fit_model(df, init=changepoint_init, apply=changepoint_apply, n_starts=8, seed=0):
    """L-BFGS least-squares fit with jittered multi-start (the max() in the
    changepoint model makes the loss piecewise and single starts fragile —
    the reference papers over this by stepping its LBFGS twice,
    analysis/data.py:117-122)."""
    # The model is ~5 parameters and the changepoint max() makes the loss
    # piecewise: derivative-free multi-start (Nelder-Mead then Powell polish)
    # is far more robust here than gradient L-BFGS in f32.
    X = model_inputs(df)
    y = jnp.asarray(df.elo.values)

    p0, unravel = jax.flatten_util.ravel_pytree(init())
    p0 = np.asarray(p0, np.float64)

    loss = jax.jit(lambda theta: jnp.square(y - apply(unravel(theta), X)).mean())

    def f(theta):
        return float(loss(jnp.asarray(theta, jnp.float32)))

    bounds = [(-30.0, 30.0)] * len(p0)
    res = scipy.optimize.differential_evolution(
        f, bounds, seed=seed, maxiter=300, tol=1e-10, polish=True, init="sobol"
    )
    polish = scipy.optimize.minimize(f, res.x, method="Nelder-Mead",
                                     options={"maxiter": 4000, "xatol": 1e-9, "fatol": 1e-12})
    best = polish.x if polish.fun < res.fun else res.x
    return unravel(jnp.asarray(best, jnp.float32))


def apply_model(params, df, apply=changepoint_apply):
    return pd.Series(np.asarray(apply(params, model_inputs(df))), df.index)


def perfect_play(params, target=-50, apply=changepoint_apply, boardsizes=range(3, 10)):
    """Flops needed per boardsize to come within `target` centi-ish Elo of
    perfect play (reference analysis/data.py:130-135)."""
    perfect = {}
    for b in boardsizes:
        f = lambda x: ELO * float(apply(params, jnp.array([[x, float(b)]]))[0]) - target
        try:
            perfect[b] = scipy.optimize.bisect(f, 1, 18)
        except ValueError:
            perfect[b] = np.nan
    return pd.Series(perfect, name="perfect")


def modelled_elos(ags):
    """Frontier per boardsize + fitted model (reference analysis/data.py:137-145)."""
    frames = []
    for b, g in ags.groupby("boardsize"):
        f = interp_frontier(g, "train_flops").reset_index()
        f.insert(0, "boardsize", b)
        frames.append(f)
    df = pd.concat(frames, ignore_index=True).dropna(subset=["elo"])
    params = fit_model(df)
    df["elohat"] = apply_model(params, df)
    return df, params


def with_times(ags):
    """Augment agents with each run's sample rate and the implied training
    time per snapshot (reference analysis/data.py:47-57, from the
    count.samples cumsum channel)."""
    from ..pavlov import stats

    rates = {}
    for r in ags.run.unique():
        try:
            arr = stats.pandas(r, "count.samples")
        except Exception:
            continue
        if arr.empty or len(arr) < 2:
            continue
        dt = (arr.index[-1] - arr.index[0]).total_seconds()
        if dt > 0:
            rates[r] = (arr.total.sum() - arr.total.iloc[0]) / dt
    rates = pd.Series(rates, name="sample_rate", dtype=float)
    rates.index = rates.index.astype(str)
    aug = pd.merge(ags.assign(run=ags.run.astype(str)), rates,
                   left_on="run", right_index=True)
    aug["train_time"] = aug.samples / aug.sample_rate
    return aug


def residual_vars(ags):
    """How well frontiers fitted on boards <= b predict the frontiers of
    larger boards (reference analysis/data.py:147-170): the transfer error
    behind the paper's extrapolation claim."""
    frames = []
    for b, g in ags.groupby("boardsize"):
        f = interp_frontier(g, "train_flops").reset_index()
        f.insert(0, "boardsize", b)
        frames.append(f)
    df = pd.concat(frames, ignore_index=True).dropna(subset=["elo"])

    boards = sorted(df.boardsize.unique())
    rows = []
    for b in boards[:-1]:
        params = fit_model(df[df.boardsize <= b])
        pred = apply_model(params, df[df.boardsize >= b])
        sub = df.loc[pred.index]
        num = (pred - sub.elo).pow(2).groupby(sub.boardsize).mean()
        den = sub.elo.pow(2).groupby(sub.boardsize).mean()
        rv = num / den
        for seen_b, v in rv.items():
            rows.append({"predicted": b, "seen": seen_b, "rv": float(v)})
    return pd.DataFrame(rows)


def train_test(ags):
    """Train-compute vs test-compute iso-Elo frontiers (reference
    analysis/data.py:172-187): for each Elo level, the cheapest
    (train_flops, test_flops) pairs that reach it."""
    df = ags.copy()
    df = df[df.samples > 0]
    df["test_flops"] = df.test_nodes * (df.train_flops / df.samples)
    df["train_flops_group"] = 10 ** np.log10(df.train_flops).round(1)

    frontiers = {}
    for e in np.linspace(-1500, 0, 7):
        sub = df[ELO * df.elo > e]
        if len(sub) == 0:
            continue
        fr = sub.groupby("train_flops_group").test_flops.min().expanding().min()
        frontiers[e] = fr
    if not frontiers:
        return pd.DataFrame(columns=["train_flops", "elo", "test_flops"])
    frontiers = pd.concat(frontiers).unstack().T
    frontiers = 10 ** np.log10(frontiers).round(1)
    # drop the flat tail where the frontier has stopped improving
    frontiers = frontiers.where(frontiers.eq(frontiers.iloc[-1], axis=1).cumsum().le(1))
    out = frontiers.stack().reset_index()
    out.columns = ["train_flops", "elo", "test_flops"]
    return out.sort_values("train_flops")


def train_test_model(frontiers):
    """log10(test) ~ log10(train) + elo linear fit (reference
    analysis/data.py:189-193) via plain least squares."""
    f = frontiers.dropna().copy()
    X = np.stack(
        [np.ones(len(f)), np.log10(f.train_flops.values), f.elo.values], axis=1
    )
    y = np.log10(f.test_flops.values)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    f["test_flops_hat"] = 10 ** (X @ coef)
    return f, pd.Series(coef, index=["intercept", "log10_train", "elo"])


def sample_calibrations(pseudocount=1):
    """Beta-posterior bands on the best agents' winrate vs MoHex per
    boardsize (reference analysis/data.py:195-207)."""
    import scipy.stats

    trials = sql.mohex_trial_query()
    ags = sql.agent_query()
    empty = pd.DataFrame(
        columns=["boardsize", "wins", "games", "winrate", "lower", "mid", "upper"]
    )
    if len(trials) == 0 or len(ags) == 0:
        return empty
    rows = []
    for aid in set(trials.black_agent.dropna()) | set(trials.white_agent.dropna()):
        if aid not in ags.index:
            continue
        as_black = trials[trials.black_agent == aid]
        as_white = trials[trials.white_agent == aid]
        wins = as_black.black_wins.sum() + as_white.white_wins.sum()
        games = (
            as_black[["black_wins", "white_wins"]].to_numpy().sum()
            + as_white[["black_wins", "white_wins"]].to_numpy().sum()
        )
        rows.append(
            {
                "boardsize": int(ags.loc[aid].boardsize),
                "wins": float(wins),
                "games": float(games),
            }
        )
    if not rows:
        return empty
    best = (
        pd.DataFrame(rows)
        .assign(winrate=lambda df: df.wins / df.games.clip(lower=1))
        .sort_values("winrate")
        .groupby("boardsize")
        .last()
        .reset_index()
    )
    dist = scipy.stats.beta(
        best.wins + pseudocount, best.games - best.wins + pseudocount
    )
    best["lower"] = dist.ppf(0.1)
    best["mid"] = dist.ppf(0.5)
    best["upper"] = dist.ppf(0.9)
    return best
