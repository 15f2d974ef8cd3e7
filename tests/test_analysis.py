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


# -- paper figures / analysis dataframes on synthetic agents ----------------

def _synthetic_ags(n_runs=4, n_snaps=6, seed=0):
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    aid = 0
    for r in range(n_runs):
        width, depth = 2 ** (4 + r), 2
        for s in range(n_snaps):
            flops = 10.0 ** (9 + r + 0.5 * s)
            rows.append(
                {
                    "run": f"run-{r}",
                    "idx": s,
                    "boardsize": 5 if r < 2 else 7,
                    "width": width,
                    "depth": depth,
                    "samples": 1e4 * (s + 1),
                    "train_flops": flops,
                    "test_nodes": 64,
                    "elo": -2.0 + 0.25 * (r + s) + rng.normal(0, 0.01),
                }
            )
            aid += 1
    return pd.DataFrame(rows, index=range(aid))


def test_train_test_frontier_and_model():
    from boardlaw_tpu.scaling import data

    ags = _synthetic_ags()
    tt = data.train_test(ags)
    assert {"train_flops", "elo", "test_flops"} <= set(tt.columns)
    f, coef = data.train_test_model(tt)
    assert np.isfinite(coef).all()
    assert "test_flops_hat" in f


def test_residual_vars_positive():
    from boardlaw_tpu.scaling import data

    rv = data.residual_vars(_synthetic_ags())
    assert len(rv) >= 1
    assert (rv.rv >= 0).all()


def test_paper_figures_render():
    import matplotlib

    matplotlib.use("Agg")
    from boardlaw_tpu.scaling import paper

    ags = _synthetic_ags()
    for fn in (paper.flops_curves, paper.frontiers, paper.train_test,
               paper.residual_vars, paper.optimal_model_size):
        fig = fn(ags)
        assert fig is not None
    fig = paper.hex_board(boardsize=5, n_moves=6)
    assert fig is not None
    assert len(paper.hyperparams_table()) == 7
    assert len(paper.boardsize_hyperparams_table(ags)) == 2
