"""Results DB + compute-frontier analysis tests."""
import numpy as np
import pandas as pd
import pytest

from boardlaw_tpu import sql, noisescales
from boardlaw_tpu.pavlov import runs, storage as pstorage
from boardlaw_tpu.pavlov.tests import mock_dir
from boardlaw_tpu.scaling import data as sdata


@pytest.fixture
def db(tmp_path, monkeypatch):
    monkeypatch.setenv("BOARDLAW_DB", str(tmp_path / "db.sql"))
    yield tmp_path


def test_refresh_and_queries(db):
    with mock_dir():
        run = runs.new_run(description="bee/3", boardsize=3, width=4, depth=1, nodes=8)
        pstorage.save_snapshot(run, {"x": np.ones(2)}, n_samples=100.0, n_flops=1e9)
        pstorage.save_snapshot(run, {"x": np.ones(2)}, n_samples=200.0, n_flops=2e9)
        sql.refresh()

        ags = sql.agent_query()
        assert len(ags) == 2
        assert set(ags.run) == {run}
        assert ags.iloc[0].boardsize == 3

        # trials roundtrip
        ids = list(ags.index)
        sql.save_trials([(ids[0], ids[1], 3, 1, 40, 1.5)])
        trials = sql.trial_query(3)
        assert len(trials) == 1
        assert trials.iloc[0].black_wins == 3

        # mohex trials + noise scales
        sql.save_mohex_trials([(ids[0], None, 2, 2, 30, 1.0)])
        assert len(sql.mohex_trial_query()) == 1
        sql.save_noise_scale(ids[0], "policy", mean_sq=1.0, sq_mean=0.5,
                             variance=0.5, n_params=100, batch_size=32, batches=8)


def test_interp_frontier():
    df = pd.DataFrame(
        {
            "run": ["a"] * 3 + ["b"] * 3,
            "train_flops": [1e9, 1e10, 1e11] * 2,
            "elo": [-3, -2, -1, -2.5, -1.5, -0.5],
        }
    )
    frontier = sdata.interp_frontier(df)
    # the upper envelope should follow run b
    assert frontier.iloc[-1] == -0.5
    assert (frontier.diff().dropna() >= -1e-9).all()


def test_changepoint_fit():
    rng = np.random.default_rng(0)
    flops = np.logspace(9, 15, 40)
    rows = []
    for b in [5, 7]:
        plateau = -0.1 * b
        elo = np.maximum(np.minimum(1.2 * (np.log10(flops) - 9) - 0.9 * b, 0), plateau)
        for f, e in zip(flops, elo):
            rows.append({"boardsize": b, "train_flops": f, "elo": e + rng.normal(0, 0.01)})
    df = pd.DataFrame(rows)
    params = sdata.fit_model(df)
    pred = sdata.apply_model(params, df)
    rmse = float(np.sqrt(((df.elo - pred) ** 2).mean()))
    assert rmse < 0.1


def test_noise_scale_stats():
    import jax.numpy as jnp

    # identical gradients -> zero variance, noise scale ~ 0
    stats = noisescales.gradient_stats(lambda b: {"w": jnp.ones(4) * b * 0 + 1.0}, [1, 2, 3])
    assert stats["variance"] == 0
    assert noisescales.noise_scale(stats, 32) == 0

    # alternating gradients -> positive noise scale
    stats = noisescales.gradient_stats(
        lambda b: {"w": jnp.ones(4) * (1.0 if b % 2 else -1.0)}, [0, 1, 2, 3]
    )
    assert stats["variance"] > 0
    assert stats["mean_sq"] == 0  # mean gradient cancels


def test_modelled_elos():
    rng = np.random.default_rng(1)
    rows = []
    for b in [5, 7]:
        for run in ["r1", "r2"]:
            off = {"r1": 0.0, "r2": 0.3}[run]
            for f in np.logspace(10, 14, 9):
                elo = max(min(1.0 * (np.log10(f) - 10) - 0.8 * b + off, 0), -0.12 * b)
                rows.append({"run": run, "boardsize": b, "train_flops": f,
                             "elo": elo + rng.normal(0, 0.01)})
    ags = pd.DataFrame(rows)
    df, params = sdata.modelled_elos(ags)
    assert {"boardsize", "train_flops", "elo", "elohat"} <= set(df.columns)
    rmse = float(np.sqrt(((df.elo - df.elohat) ** 2).mean()))
    assert rmse < 0.1


def test_noise_scale_study(db):
    """End-to-end offline study: tiny run -> snapshot -> registered agent ->
    fresh-chunk per-timestep grads -> noise_scales rows -> analysis join
    (reference noisescales.py:39-158)."""
    from boardlaw_tpu import train
    from boardlaw_tpu.pavlov import storage as pstorage2

    with mock_dir():
        run = train.run(
            boardsize=3, width=4, depth=1, n_envs=8, nodes=4,
            mix_steps=8, buffer_len=4, max_steps=2, storer="time",
        )
        sd = pstorage2.load_latest(run)
        pstorage2.save_snapshot(run, {"agent": sd["agent"]}, n_samples=16.0, n_flops=1e6)
        sql.refresh()
        snaps = sql.query("select * from snaps where run == ?", run)
        idx = int(snaps.idx.iloc[0])

        aid = noisescales.evaluate(
            run, idx, nodes=4, c_puct=1 / 16, perf=False, n_envs=16, chunk_len=8
        )
        rows = sql.query("select * from noise_scales where agent_id == ?", aid)
        assert set(rows.kind) == {"policy", "value", "joint"}
        assert (rows.n_params > 0).all()
        assert (rows.batches == 8).all()

        # idempotent: re-evaluating doesn't duplicate rows
        noisescales.evaluate_noise_scale(aid, n_envs=16, chunk_len=8)
        assert len(sql.query("select * from noise_scales where agent_id == ?", aid)) == 3

        df = noisescales.load()
        assert {"policy", "value", "joint"} <= set(df.columns)
        assert np.isfinite(df.loc[aid, "policy"])
