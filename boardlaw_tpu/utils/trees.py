"""Pytree utilities.

The reference's universal container is ``arrdict`` (reference rebar/arrdict.py:19-68):
an attribute-access dict of tensors with broadcast indexing, ``stack``/``cat``, etc.
In a JAX-native design the role of arrdict is played by *pytrees* — any nested
structure of ``flax.struct`` dataclasses / dicts / tuples of arrays composes with
``jit``/``vmap``/``scan`` automatically — so this module is deliberately tiny:
just the handful of tree-wide helpers the rest of the framework leans on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def map_tree(f, tree, *rest):
    """`jax.tree.map` alias with the framework's house name."""
    return jax.tree.map(f, tree, *rest)


def stack(trees, axis=0):
    """Stack a list of identically-structured pytrees along a new axis.

    Equivalent of reference rebar/arrdict.py:87-100 ``arrdict.stack``.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *trees)


def concat(trees, axis=0):
    """Concatenate a list of identically-structured pytrees along an axis."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def where(cond, a, b):
    """Leaf-wise ``jnp.where`` with a condition broadcast against leading axes.

    ``cond`` has shape equal to a prefix of every leaf's shape (typically the
    env-batch axis); it is expanded with trailing singleton axes per leaf.
    """

    def _where(x, y):
        c = cond.reshape(cond.shape + (1,) * (x.ndim - cond.ndim))
        return jnp.where(c, x, y)

    return jax.tree.map(_where, a, b)


def index(tree, idx):
    """Index every leaf of a pytree with the same (leading-axis) index."""
    return jax.tree.map(lambda x: x[idx], tree)


def leading_shape(tree, n=1):
    """The common leading ``n`` axes of every leaf."""
    leaves = jax.tree.leaves(tree)
    shape = leaves[0].shape[:n]
    return shape


def flatten_leading(tree, n=2):
    """Merge the first ``n`` axes of every leaf into one."""
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[n:]), tree)


def unflatten_leading(tree, shape):
    """Split the first axis of every leaf into ``shape``."""
    return jax.tree.map(lambda x: x.reshape(tuple(shape) + x.shape[1:]), tree)
