"""Training utilities: returns, entropy, env warmup, gradient noise scale.

Reference counterpart: boardlaw/learning.py. The reverse time-recursion of
`present_value` (learning.py:57-68) becomes a `lax.scan(reverse=True)` — one
compiled scan instead of a python loop over timesteps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mix(world, key, T=2500):
    """Decorrelate envs by random-walking them T steps before training starts
    (reference learning.py:6-10). One jitted scan."""

    def body(carry, _):
        world, key = carry
        key, sub = jax.random.split(key)
        logits = jnp.where(world.valid, 0.0, -jnp.inf)
        actions = jax.random.categorical(sub, logits, axis=-1)
        world, _ = world.step(actions)
        return (world, key), None

    (world, _), _ = jax.lax.scan(body, (world, key), None, length=T)
    return world


def present_value(deltas, fallback, terminal, alpha):
    """Reverse-scan recursion: result[T-1] = fallback[T-1];
    result[t] = fallback[t] if terminal[t] else deltas[t] + alpha*result[t+1]
    (reference learning.py:57-68)."""

    def body(nxt, x):
        delta, fb, term = x
        cur = jnp.where(term, fb, delta + alpha * nxt)
        return cur, cur

    last = fallback[-1]
    _, out = jax.lax.scan(
        body, last, (deltas, fallback[:-1], terminal[:-1]), reverse=True
    )
    return jnp.concatenate([out, last[None]], 0)


def reward_to_go(reward, value, terminal, gamma=1.0):
    """Value targets: accumulated rewards bootstrapped with the network value
    at the end of the window; episodes cut at terminals (reference
    learning.py:70-76).

    reward/value/terminal: (T, ...) with matching shapes.
    """
    fallback = jnp.where(terminal, reward, value)
    return present_value(reward[:-1], fallback, terminal, gamma)


def rel_entropy(logits):
    """(mean policy entropy, mean log #valid-actions) — the pair whose ratio
    is the relative entropy stat (reference learning.py:19-24)."""
    valid = logits > -jnp.inf
    zeros = jnp.zeros_like(logits)
    l = jnp.where(valid, logits, zeros)
    probs = jnp.where(valid, jnp.exp(l), zeros)
    return (
        -(l * probs).sum(-1).mean(),
        jnp.log(valid.sum(-1).astype(jnp.float32)).mean(),
    )


def noise_scale(batch_size, opt_state):
    """Gradient noise-scale estimate from Adam's first/second-moment statistics
    (reference learning.py:26-41). Pass the optax Adam state (ScaleByAdamState
    anywhere in the tree) and the per-step batch size."""
    adam = None
    for s in jax.tree.leaves(opt_state, is_leaf=lambda x: hasattr(x, "mu")):
        if hasattr(s, "mu"):
            adam = s
            break
    if adam is None:
        return jnp.nan

    beta1, beta2 = 0.9, 0.999
    step = adam.count
    m_bias = 1 - beta1 ** step
    v_bias = 1 - beta2 ** step

    m = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(adam.mu)]) / m_bias
    v = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(adam.nu)]) / v_bias

    inflator = (1 - beta1 ** 2) / (1 - beta1) ** 2
    S = batch_size * (v.mean() - jnp.square(m).mean())
    G2 = inflator * jnp.square(m).mean()
    return S / G2
