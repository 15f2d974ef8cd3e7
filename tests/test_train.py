"""Training-layer tests: return targets (reference learning.py:83-94) and an
end-to-end tiny run with step-level resume."""
import numpy as np
import jax
import jax.numpy as jnp

from boardlaw_tpu import learning, train
from boardlaw_tpu.pavlov import stats, storage
from boardlaw_tpu.pavlov.tests import mock_dir


def test_reward_to_go():
    reward = jnp.array([1.0, 2.0, 3.0])
    value = jnp.array([4.0, 5.0, 6.0])

    terminal = jnp.array([False, False, False])
    actual = learning.reward_to_go(reward, value, terminal)
    np.testing.assert_allclose(np.asarray(actual), [9.0, 8.0, 6.0])

    terminal = jnp.array([False, True, False])
    actual = learning.reward_to_go(reward, value, terminal)
    np.testing.assert_allclose(np.asarray(actual), [3.0, 2.0, 6.0])


def test_reward_to_go_batched():
    # (T, B, S) shapes as the train loop uses them
    T, B, S = 5, 3, 2
    key = jax.random.PRNGKey(0)
    reward = jax.random.normal(key, (T, B, S))
    value = jax.random.normal(jax.random.PRNGKey(1), (T, B, S))
    terminal = jnp.zeros((T, B, S), bool).at[2, 1].set(True)
    out = learning.reward_to_go(reward, value, terminal)
    assert out.shape == (T, B, S)
    # last row is the bootstrap value
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(value[-1]))
    # at the terminal, the target collapses to the reward
    np.testing.assert_allclose(np.asarray(out[2, 1]), np.asarray(reward[2, 1]))


def test_rel_entropy_uniform():
    logits = jnp.log(jnp.full((4, 8), 1 / 8))
    ent, log_n = learning.rel_entropy(logits)
    np.testing.assert_allclose(float(ent), np.log(8), rtol=1e-5)
    np.testing.assert_allclose(float(log_n), np.log(8), rtol=1e-5)


def test_tiny_run_and_resume():
    with mock_dir():
        run = train.run(
            boardsize=3, width=4, depth=1, n_envs=8, nodes=8,
            mix_steps=16, buffer_len=4, max_steps=2, storer="time",
        )
        sd = storage.load_latest(run)
        assert int(np.asarray(sd["agent"]["step"])) == 2
        assert "params" in sd["agent"]
        assert stats.resampled(run, "count.samples", "1h").dropna().iloc[-1] == 16

        # resume continues the same run and step counter
        train.run(
            boardsize=3, width=4, depth=1, n_envs=8, nodes=8,
            mix_steps=16, buffer_len=4, max_steps=4, storer="time", resume=run,
        )
        sd2 = storage.load_latest(run)
        assert int(np.asarray(sd2["agent"]["step"])) == 4
        # sample/FLOP accounting continues rather than restarting at zero:
        # 2 steps x 8 envs before resume, +2 after = 32 total samples
        assert sd2["n_samples"] == 32
        assert sd2["n_flops"] > sd["n_flops"] > 0


def test_storer_seed_advances_savepoints():
    from boardlaw_tpu.storage import FlopsStorer

    with mock_dir():
        from boardlaw_tpu.pavlov import runs

        run = runs.new_run(description="seed-test")
        storer = FlopsStorer(run, boardsize=3, flops_per=1.0)
        mid = storer.savepoints[5]
        storer.seed(n_flops=mid, n_samples=123.0, runtime=7.0)
        assert storer.n_samples == 123.0
        # savepoints at or below the restored FLOP count are already taken
        assert storer.next_point == 6


def test_flops_per_sample():
    params = {"w": np.zeros((4, 8)), "b": np.zeros(8), "alpha": np.zeros(())}
    # 2D: 32 MACs, 1D: 8 adds, 0D scalars ignored -> 40 per eval, x nodes
    assert train.bstorage.flops_per_sample(params, 64) == 64 * 40
