"""Gradient noise-scale measurement.

Reference counterpart: boardlaw/noisescales.py — estimates the critical batch
size from gradient statistics, both (a) online from Adam's moments during
training (learning.noise_scale, logged each step) and (b) offline by
computing per-slice gradients over a replay chunk and comparing the variance
of small-batch gradients to the full-batch gradient (noisescales.py:66-120).
"""
from __future__ import annotations

from logging import getLogger

import jax
import jax.numpy as jnp
import numpy as np

from . import sql

log = getLogger(__name__)


def gradient_stats(grad_fn, batches):
    """Per-slice flat gradients -> (|mean g|^2, mean |g|^2, variance, n_params).

    grad_fn(batch) must return a gradient pytree; `batches` is an iterable of
    equal-size batches (the reference's per-timestep slices,
    noisescales.py:66-94).
    """
    flats = []
    for b in batches:
        g = grad_fn(b)
        flats.append(jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(g)]))
    G = jnp.stack(flats)  # (K, P)
    mean_g = G.mean(0)
    sq_mean = float(jnp.square(mean_g).mean())
    mean_sq = float(jnp.square(G).mean())
    variance = float(G.var(0).mean())
    return {
        "sq_mean": sq_mean,
        "mean_sq": mean_sq,
        "variance": variance,
        "n_params": float(G.shape[1]),
        "batches": float(G.shape[0]),
    }


def noise_scale(stats, batch_size):
    """Simple noise scale B_crit ~ batch * var / |mean grad|^2 (McCandlish et
    al.); matches what the reference logs per component."""
    return batch_size * stats["variance"] / max(stats["sq_mean"], 1e-12)


def measure(model, params, batch, loss_fn, n_slices=8, batch_size=None):
    """Split a replay batch into `n_slices` equal slices, measure gradient
    statistics for the loss (reference collect + grads, noisescales.py:39-94).

    loss_fn(params, sub_batch) -> scalar.
    """
    B = jax.tree.leaves(batch)[0].shape[0]
    k = B // n_slices
    grad_fn = jax.jit(jax.grad(loss_fn))

    def slices():
        for i in range(n_slices):
            yield jax.tree.map(lambda x: x[i * k : (i + 1) * k], batch)

    stats = gradient_stats(lambda b: grad_fn(params, b), slices())
    stats["batch_size"] = float(batch_size or k)
    return stats


def persist(agent_id, kind, stats):
    """Record a measurement in the results DB (reference noisescales.py:96-120)."""
    sql.save_noise_scale(agent_id, kind, **stats)
