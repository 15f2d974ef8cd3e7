"""Variational-Bayes Elo: full-covariance Gaussian posterior over ratings.

Reference counterpart: activelo/solvers.py. The model is identical — prior
N(0, 10^2) per rating, Bradley-Terry likelihood, ELBO maximised over a
full-covariance Gaussian q(ratings) — but the machinery is JAX-native:

  * Σ is parametrised as L·Lᵀ with a softplus-positive diagonal Cholesky
    factor (replacing geotorch's positive-definite constraint).
  * E[-log(1+e^-d)] under N(μd, σ²d) is computed by *direct, differentiable*
    Gauss-Hermite quadrature inside the loss — the reference needed a
    precomputed 1001x1001 spline with finite-difference gradients
    (activelo/expectations.py:17-72) because torch couldn't differentiate
    through its table; in JAX the quadrature itself is autodiffable, so that
    entire subsystem collapses into ~5 lines.
  * Optimisation is scipy L-BFGS over jax.value_and_grad (host-scale
    problem: N agents).
"""
from __future__ import annotations

from dataclasses import dataclass
from logging import getLogger

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import scipy.optimize

log = getLogger(__name__)

MU_0 = 0.0
SIGMA_0 = 10.0

_HERM_POINTS = 50
_herm_z, _herm_w = np.polynomial.hermite_e.hermegauss(_HERM_POINTS)
_HERM_Z = jnp.asarray(_herm_z)
_HERM_W = jnp.asarray(_herm_w / np.sqrt(2 * np.pi))


def expected_log_sigmoid(mu, sigma2):
    """E[-log(1 + e^-d)] for d ~ N(mu, sigma2), by Gauss-Hermite quadrature.
    Differentiable in both arguments."""
    d = mu[..., None] + _HERM_Z * jnp.sqrt(jnp.maximum(sigma2, 1e-12))[..., None]
    return (-jnp.logaddexp(0.0, -d) * _HERM_W).sum(-1)


def _unpack(theta, N):
    mu = theta[:N]
    tril = jnp.zeros((N, N)).at[jnp.tril_indices(N)].set(theta[N:])
    diag = jax.nn.softplus(jnp.diagonal(tril)) + 1e-6
    L = tril.at[jnp.diag_indices(N)].set(diag)
    return mu, L


def _pack_init(mu, Sigma, N):
    L = np.linalg.cholesky(Sigma)
    d = np.diagonal(L).copy()
    # invert softplus for the diagonal
    raw = np.log(np.expm1(np.maximum(d - 1e-6, 1e-8)))
    L = L.copy()
    L[np.diag_indices(N)] = raw
    return np.concatenate([np.asarray(mu), L[np.tril_indices(N)]])


def _elbo(theta, n, w, N):
    mu, L = _unpack(theta, N)
    Sigma = L @ L.T

    # entropy of q (reference solvers.py:82-85)
    logdet = 2 * jnp.log(jnp.diagonal(L)).sum()
    entropy = 0.5 * (N * jnp.log(2 * jnp.pi * jnp.e) + logdet)

    # E_q[log prior] (reference solvers.py:59-63)
    prior = (
        -0.5 * jnp.log(2 * jnp.pi)
        - jnp.log(SIGMA_0)
        - 1 / (2 * SIGMA_0 ** 2) * (jnp.square(mu - MU_0) + jnp.diagonal(Sigma))
    ).sum()

    # E_q[log likelihood] over all ordered pairs (reference solvers.py:65-77)
    mud = mu[:, None] - mu[None, :]
    diag = jnp.diagonal(Sigma)
    s2d = diag[:, None] + diag[None, :] - 2 * Sigma

    p = expected_log_sigmoid(mud, s2d)
    q = expected_log_sigmoid(-mud, s2d)
    offdiag = 1.0 - jnp.eye(N)
    ll = ((w * p + (n - w) * q) * offdiag).sum()

    return entropy + prior + ll


@dataclass
class Solution:
    n: object
    w: object
    mu: object
    Sigma: object
    mud: object
    sigmad: object

    # Greek-letter aliases matching the reference's field names
    @property
    def μ(self):
        return self.mu

    @property
    def Σ(self):
        return self.Sigma

    @property
    def μd(self):
        return self.mud

    @property
    def σd(self):
        return self.sigmad


def _solve(n, w, soln=None, max_iter=200):
    n = np.asarray(n, float)
    w = np.asarray(w, float)
    N = n.shape[0]

    if soln is not None:
        theta0 = _pack_init(np.asarray(soln.mu), np.asarray(soln.Sigma), N)
    else:
        theta0 = _pack_init(np.zeros(N), np.eye(N), N)

    nj, wj = jnp.asarray(n), jnp.asarray(w)
    vg = jax.jit(jax.value_and_grad(lambda t: -_elbo(t, nj, wj, N)))

    def f(theta):
        v, g = vg(jnp.asarray(theta))
        return float(v), np.asarray(g, np.float64)

    res = scipy.optimize.minimize(
        f, theta0, jac=True, method="L-BFGS-B", options={"maxiter": max_iter}
    )
    if not np.isfinite(res.fun):
        log.warning(f"activelo did not converge: {res.message}")

    mu, L = _unpack(jnp.asarray(res.x), N)
    Sigma = np.asarray(L @ L.T)
    mu = np.asarray(mu)
    diag = np.diagonal(Sigma)
    s2d = diag[:, None] + diag[None, :] - 2 * Sigma
    return Solution(
        n=n, w=w, mu=mu, Sigma=Sigma, mud=mu[:, None] - mu[None, :],
        sigmad=np.sqrt(np.maximum(s2d, 0)),
    )


def solve(n, w, soln=None, **kwargs):
    """Posterior over ratings from games/wins matrices; accepts and returns
    pandas when given DataFrames (reference solvers.py:147-150)."""
    if isinstance(n, pd.DataFrame):
        s = _solve(n.values, w.values, soln=soln, **kwargs)
        idx = n.index
        return Solution(
            n=n,
            w=w,
            mu=pd.Series(s.mu, idx),
            Sigma=pd.DataFrame(s.Sigma, idx, idx),
            mud=pd.DataFrame(s.mud, idx, idx),
            sigmad=pd.DataFrame(s.sigmad, idx, idx),
        )
    return _solve(n, w, soln=soln, **kwargs)
