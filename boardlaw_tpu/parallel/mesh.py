"""Device-mesh plumbing: data-parallel sharding of the training state.

The reference scales out at the *experiment* level only (one GPU per run,
SURVEY.md §2.2); here the single-program train step shards the env batch over
a `jax.sharding.Mesh` axis ('dp') and replicates parameters, letting XLA
insert the gradient psum over ICI — the TPU-native replacement for both the
giant-batch env axis and a data-parallel learner.

On real hardware the mesh spans the slice's chips; in tests and dryruns it
spans virtual CPU devices (`--xla_force_host_platform_device_count`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="dp"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def env_sharding(mesh, batch_axis=0, axis="dp"):
    """Sharding placing the env axis of a leaf across the mesh."""

    def of(leaf):
        spec = [None] * leaf.ndim
        if leaf.ndim > batch_axis:
            spec[batch_axis] = axis
        return NamedSharding(mesh, P(*spec))

    return of


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_train_state(state, mesh, axis="dp"):
    """Place a TrainState on the mesh: worlds sharded on the env axis (axis 0
    of every leaf), the replay buffer on its env axis (axis 1: leaves are
    (T, B, ...)), params/opt/key/counters replicated.

    After this, the already-jitted train_step partitions automatically under
    GSPMD: env/search/actor math stays local to each shard, the learner's
    gradient reduction becomes an all-reduce over ICI.
    """
    rep = replicated(mesh)
    world_shard = env_sharding(mesh, 0, axis)
    buffer_shard = env_sharding(mesh, 1, axis)
    return state.replace(
        worlds=jax.tree.map(lambda x: jax.device_put(x, world_shard(x)), state.worlds),
        buffer=jax.tree.map(lambda x: jax.device_put(x, buffer_shard(x)), state.buffer),
        params=jax.device_put(state.params, rep),
        opt_state=jax.tree.map(lambda x: jax.device_put(x, rep), state.opt_state),
        key=jax.device_put(state.key, rep),
        step=jax.device_put(state.step, rep),
    )
