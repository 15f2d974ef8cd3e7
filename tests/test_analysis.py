"""Rollout/recording tests (reference boardlaw/analysis.py)."""
import numpy as np
import jax

from boardlaw_tpu import analysis
from boardlaw_tpu.envs import hex, validation
from boardlaw_tpu.utils import recording


def _random_agent():
    inner = validation.RandomAgent()

    def agent(world, key, **kwargs):
        d = inner(world)
        return {**d, "actions": jax.random.categorical(key, d["logits"], axis=-1)}

    return agent


def test_rollout_steps():
    world = hex.Hex.initial(4, 3)
    trace = analysis.rollout(world, [_random_agent(), _random_agent()], n_steps=6)
    assert trace["actions"].shape == (6, 4)
    assert trace["worlds"].board.shape == (6, 4, 3, 3)
    d = trace["decisions"]
    assert set(d) == {"0", "1"}
    # seat masks partition the envs at every step
    m0, m1 = d["0"]["mask"], d["1"]["mask"]
    assert ((m0 ^ m1).all()), "every env owned by exactly one agent per step"


def test_rollout_trajs():
    world = hex.Hex.initial(4, 3)
    trace = analysis.rollout(world, [_random_agent(), _random_agent()], n_trajs=4)
    assert np.asarray(trace["transitions"].terminal).sum() >= 4


def test_rollout_reps():
    world = hex.Hex.initial(2, 3)
    trace = analysis.rollout(world, [_random_agent(), _random_agent()], n_reps=1)
    assert (np.asarray(trace["transitions"].terminal).sum(0) >= 1).all()


def test_record_worlds():
    world = hex.Hex.initial(2, 3)
    trace = analysis.rollout(world, [_random_agent(), _random_agent()], n_steps=3)
    enc = analysis.record_worlds(trace["worlds"], n_envs=2)
    arr = enc.array()
    assert arr.shape[0] == 3  # one frame per step
    assert arr.shape[-1] == 3


def test_encoder_save(tmp_path):
    enc = recording.Encoder(fps=2)
    for _ in range(3):
        enc(np.zeros((32, 32, 3), np.uint8))
    out = enc.save(tmp_path / "demo.mp4")
    assert out.exists()
