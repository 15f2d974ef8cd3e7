"""World protocol: the contract every vectorized game implements.

Reference counterpart: the implicit protocol described in SURVEY.md §1 L3 and
implemented by reference boardlaw/hex/__init__.py:120-195 and heads.py:7-11.

A *world* here is a `flax.struct` pytree ``State`` plus pure functions:

    State.initial(n_envs, ...)          -> State              (classmethod)
    state.step(actions, key=None)       -> (State, Transition)
    state.obs                           -> (n_envs, *obs_space.dim) f32
    state.valid                         -> (n_envs, n_actions) bool
    state.seats                         -> (n_envs,) int32
    state.n_seats / obs_space / action_space   (static python attrs)

Terminal envs auto-reset inside ``step`` and the pre-reset outcome is reported
in the returned ``Transition`` — exactly the reference's behaviour
(hex/__init__.py:183-189).

Everything is jit/vmap/shard-friendly: states are pytrees of arrays with a
leading env axis, methods build no host-side state.
"""
from __future__ import annotations

from collections import namedtuple

from flax import struct
import jax.numpy as jnp


class Transition(struct.PyTreeNode):
    """Result of stepping a world.

    terminal: (n_envs,) bool — env finished (and was auto-reset) this step
    rewards:  (n_envs, n_seats) f32 — per-seat rewards granted this step
    """

    terminal: jnp.ndarray
    rewards: jnp.ndarray


# Space descriptors — plain named tuples, used by the space-driven head
# factories (models/heads.py). Reference heads.py:7-11.
Empty = namedtuple("Empty", ())
Discrete = namedtuple("Discrete", ("dim",))
Masked = namedtuple("Masked", ("dim",))
Vector = namedtuple("Vector", ("dim",))
Tensor = namedtuple("Tensor", ("dim",))
