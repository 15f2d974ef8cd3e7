"""Policy/value networks.

Reference counterpart: boardlaw/networks.py — a fully-connected ReZero
residual tower (Bachlechner et al.) over the flattened board observation,
with a masked-softmax policy head and a tanh value head.

TPU notes: the tower is pure dense matmuls — exactly what the MXU wants.
Batch dim stays large (tens of thousands of envs); compute dtype is bf16 by
default with f32 params and f32 heads. All forward passes are pure functions
of (params, obs, valid, seats) so they fuse into the surrounding jit (e.g.
inside the MCTS simulate scan) with no host sync.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import heads


class ReZeroResidual(nn.Module):
    """x + α·W·relu(x), α initialised to 0 so depth-64 towers start as the
    identity (reference networks.py:10-18)."""

    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(
            self.width,
            dtype=self.dtype,
            kernel_init=heads._orthogonal(2 ** 0.5),
        )(jax.nn.relu(x))
        alpha = self.param("alpha", nn.initializers.zeros, ())
        return x + alpha.astype(self.dtype) * y


class FCModel(nn.Module):
    """Intake -> depth x ReZero -> (masked policy, per-seat tanh value).

    Reference networks.py:20-41. Call with (obs, valid, seats); returns a dict
    {'logits': (B, A) f32 log-probs with -inf at invalid, 'v': (B, n_seats)}.
    """

    obs_space: tuple
    action_space: tuple
    width: int = 256
    depth: int = 64
    n_seats: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, valid, seats):
        x = heads.intake_module(self.obs_space, self.width, self.dtype, name="intake")(obs)
        for i in range(self.depth):
            x = ReZeroResidual(self.width, self.dtype, name=f"block_{i}")(x)
        logits = heads.output_module(
            self.action_space, self.width, self.dtype, name="policy"
        )(x, valid)
        v = heads.ValueOutput(self.width, self.n_seats, self.dtype, name="value")(
            x, valid, seats
        )
        return {"logits": logits, "v": v}


def make_eval_fn(model, params):
    """Close a flax model over params as a world-protocol evaluator:
    ``eval_fn(world) -> {'logits', 'v'}`` — the network interface MCTS and the
    actor consume (mirrors the reference's `network(world)` calls)."""

    def eval_fn(world, key=None):
        return model.apply(params, world.obs, world.valid, world.seats)

    return eval_fn
