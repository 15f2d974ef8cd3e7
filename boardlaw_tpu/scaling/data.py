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
