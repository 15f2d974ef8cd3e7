"""Multi-device sharding tests on the virtual 8-device CPU mesh (SURVEY.md
§4.6's distributed-tests-without-a-cluster pattern)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boardlaw_tpu.parallel import make_mesh, shard_train_state, env_sharding
from boardlaw_tpu.train import TrainConfig, make_train


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def test_mesh(eight_devices):
    mesh = make_mesh(8)
    assert mesh.shape["dp"] == 8


def test_sharded_train_step(eight_devices):
    cfg = TrainConfig(
        boardsize=3, width=4, depth=1, n_envs=16, buffer_len=4,
        n_nodes=4, mix_steps=4,
    )
    model, opt, init, warmup, train_step = make_train(cfg)
    mesh = make_mesh(8)

    state = init(jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)

    # env leaves are sharded over dp; params replicated
    world_shard = state.worlds.board.sharding
    assert world_shard.spec[0] == "dp"
    param_leaf = jax.tree.leaves(state.params)[0]
    assert param_leaf.sharding.spec == ()

    state = warmup(state)
    state, aux = train_step(state)
    assert np.isfinite(float(aux["loss.total"]))

    # a second step keeps running (donation/aliasing sanity)
    state, aux2 = train_step(state)
    assert np.isfinite(float(aux2["loss.total"]))


def test_sharded_matches_single_device(eight_devices):
    """The sharded program computes the same loss as the unsharded one."""
    cfg = TrainConfig(
        boardsize=3, width=4, depth=1, n_envs=16, buffer_len=4,
        n_nodes=4, mix_steps=4,
    )
    model, opt, init, warmup, train_step = make_train(cfg)

    s_single = warmup(init(jax.random.PRNGKey(0)))
    s_sharded = shard_train_state(warmup(init(jax.random.PRNGKey(0))), make_mesh(8))

    _, aux_single = train_step(s_single)
    _, aux_sharded = train_step(s_sharded)
    np.testing.assert_allclose(
        float(aux_single["loss.total"]), float(aux_sharded["loss.total"]), rtol=1e-4
    )
