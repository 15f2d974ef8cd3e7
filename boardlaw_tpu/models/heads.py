"""Space-driven network intakes and outputs.

Reference counterpart: boardlaw/heads.py. The observation/action *space*
descriptors (envs/base.py: Empty/Discrete/Masked/Vector/Tensor, plus dicts of
spaces) drive which intake/output module a model grows — `intake(space, width)`
and `output(space, width)` factories (reference heads.py:67-73, :144-150).

TPU notes: all dense layers run in a configurable compute dtype (bf16 by
default on TPU — replaces the reference's AMP autocast, main.py:78), with f32
parameters and f32 head outputs for numerical stability of log-softmax.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..envs.base import Discrete, Masked, Tensor, Vector, Empty  # noqa: F401


def _orthogonal(gain=2 ** 0.5):
    return nn.initializers.orthogonal(scale=gain)


class EmptyIntake(nn.Module):
    space: tuple
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        bias = self.param("bias", nn.initializers.zeros, (self.width,))
        B = obs.shape[0]
        return jnp.broadcast_to(bias[None].astype(self.dtype), (B, self.width))


class VectorIntake(nn.Module):
    space: tuple
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        return nn.Dense(self.width, dtype=self.dtype)(obs.astype(self.dtype))


class TensorIntake(nn.Module):
    """Flattens a fixed-shape observation tensor into one dense layer —
    the board-game path (reference heads.py:41-52)."""

    space: tuple
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        B = obs.shape[0]
        flat = obs.reshape(B, -1).astype(self.dtype)
        return nn.Dense(self.width, dtype=self.dtype)(flat)


class ConcatIntake(nn.Module):
    """Dict-of-spaces intake: per-key intakes concatenated through one dense
    core (reference heads.py:54-66)."""

    space: dict
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        ys = [
            intake_module(v, self.width, self.dtype, name=f"intake_{k}")(obs[k])
            for k, v in self.space.items()
        ]
        return nn.Dense(self.width, dtype=self.dtype)(jnp.concatenate(ys, -1))


def intake_module(space, width, dtype=jnp.float32, name=None):
    if isinstance(space, dict):
        return ConcatIntake(space, width, dtype, name=name)
    cls = {
        "Empty": EmptyIntake,
        "Vector": VectorIntake,
        "Tensor": TensorIntake,
    }.get(type(space).__name__)
    if cls is None:
        raise ValueError(f"Can't handle {space}")
    return cls(space, width, dtype, name=name)


# Back-compat alias matching the reference factory name
intake = intake_module


class DiscreteOutput(nn.Module):
    space: tuple
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None):
        dim = int(np.prod(self.space.dim)) if hasattr(self.space, "dim") else int(self.space)
        y = nn.Dense(dim, dtype=self.dtype)(x).astype(jnp.float32)
        return jax.nn.log_softmax(y, axis=-1)


class MaskedOutput(nn.Module):
    """Policy head with -inf masking of invalid actions then log-softmax
    (reference heads.py:93-110)."""

    space: tuple
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid):
        dim = int(np.prod(self.space.dim))
        y = nn.Dense(dim, dtype=self.dtype)(x).astype(jnp.float32)
        y = jnp.where(valid, y, -jnp.inf)
        # log_softmax over the valid entries only; invalid stay -inf
        ymax = jnp.max(jnp.where(valid, y, -jnp.inf), -1, keepdims=True)
        z = jnp.where(valid, y - ymax, -jnp.inf)
        lse = jnp.log(jnp.sum(jnp.where(valid, jnp.exp(z), 0.0), -1, keepdims=True))
        return jnp.where(valid, z - lse, -jnp.inf)


def output_module(space, width, dtype=jnp.float32, name=None):
    cls = {
        "Discrete": DiscreteOutput,
        "Masked": MaskedOutput,
    }.get(type(space).__name__)
    if cls is None:
        raise ValueError(f"Can't handle {space}")
    return cls(space, width, dtype, name=name)


output = output_module


def scatter_values(v, seats):
    """Map a scalar value-for-current-seat into per-seat values (+v for the
    seat to play, -v for the opponent) — reference heads.py:128-132."""
    B = v.shape[0]
    seats = seats.astype(jnp.int32)
    envs = jnp.arange(B)
    out = jnp.zeros((B, 2), v.dtype)
    out = out.at[envs, seats].set(v)
    out = out.at[envs, 1 - seats].set(-v)
    return out


class ValueOutput(nn.Module):
    """tanh scalar value head scattered to per-seat ±v (reference
    heads.py:134-142). For one-seat games the scalar is returned directly."""

    width: int
    n_seats: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, seats):
        v = nn.Dense(1, dtype=self.dtype)(x).astype(jnp.float32)[..., 0]
        v = jnp.tanh(v)
        if self.n_seats == 1:
            return v[:, None]
        return scatter_values(v, seats)
