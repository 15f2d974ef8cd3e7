"""Experiment-tracking tests, in the reference's mocked-clock/dir style
(SURVEY.md §4.5; reference pavlov/tests.py:10-60)."""
import datetime
import logging

import numpy as np
import pytest

from boardlaw_tpu.pavlov import files, logs, npr, runs, stats, storage
from boardlaw_tpu.pavlov.tests import mock_dir, mock_time


def test_run_registry():
    with mock_dir(), mock_time():
        run = runs.new_run(description="demo", width=4, depth=2)
        assert runs.exists(run)
        info = runs.info(run)
        assert info["description"] == "demo"
        assert info["params"] == {"width": 4, "depth": 2}

        assert runs.resolve(-1) == run
        df = runs.pandas()
        assert df.loc[run, "params.width"] == 4

        runs.delete(run)
        assert not runs.exists(run)


def test_file_registry():
    with mock_dir(), mock_time():
        run = runs.new_run()
        p0 = files.new_file(run, "thing.{n}.txt")
        p1 = files.new_file(run, "thing.{n}.txt")
        assert p0.name == "thing.0.txt"
        assert p1.name == "thing.1.txt"
        assert files.glob(run, "thing.{n}.txt") == ["thing.0.txt", "thing.1.txt"]
        assert files.seq(run, "thing.{n}.txt") == [(0, "thing.0.txt"), (1, "thing.1.txt")]


def test_npr_roundtrip(tmp_path):
    p = tmp_path / "x.npr"
    w = npr.Writer(p)
    for i in range(5):
        w.write({"_time": i, "x": float(i) ** 2})
    # read while the writer is still open — like a live monitor
    arr = npr.Reader(p).read()
    assert len(arr) == 5
    np.testing.assert_allclose(arr["x"], [0, 1, 4, 9, 16])
    w.close()

    # append with a fresh writer
    w2 = npr.Writer(p)
    w2.write({"_time": 5, "x": 25.0})
    w2.close()
    assert len(npr.Reader(p).read()) == 6


def test_stats_roundtrip():
    with mock_dir():
        run = runs.new_run()
        with stats.to_run(run):
            stats.mean("loss", 4.0)
            stats.mean("loss", 2.0)
            stats.cumsum("count.samples", 10)
            stats.cumsum("count.samples", 5)
            stats.max("grad.max", 1.0)
            stats.max("grad.max", 3.0)
            stats.mean_std("elo", 0.5, 0.1)

        assert set(stats.channels(run)) == {"loss", "count.samples", "grad.max", "elo"}
        assert stats.kind_of(run, "loss") == "mean"

        loss = stats.resampled(run, "loss", "1h").dropna()
        assert loss.iloc[-1] == 3.0  # (4+2)/2

        total = stats.resampled(run, "count.samples", "1h").dropna()
        assert total.iloc[-1] == 15

        gmax = stats.resampled(run, "grad.max", "1h").dropna()
        assert gmax.iloc[-1] == 3.0

        review = stats.review(run, "1h")
        assert "loss" in review


def test_stats_deferred():
    with mock_dir():
        run = runs.new_run()
        with stats.to_run(run):
            with stats.defer():
                stats.mean("a", 1.0)
                stats.mean("a", 3.0)
        assert stats.resampled(run, "a", "1h").dropna().iloc[-1] == 2.0


def test_stats_noop_outside_context():
    with mock_dir():
        runs.new_run()
        stats.mean("ignored", 1.0)  # must not raise or write


def test_storage_roundtrip():
    with mock_dir():
        run = runs.new_run()
        tree = {"w": np.arange(6).reshape(2, 3).astype(np.float32), "b": np.zeros(3)}

        storage.save_latest(run, tree)
        out = storage.load_latest(run)
        np.testing.assert_array_equal(out["w"], tree["w"])

        storage.save_snapshot(run, tree, samples=100)
        storage.save_snapshot(run, tree, samples=200)
        snaps = storage.snapshots(run)
        assert sorted(snaps) == [0, 1]
        assert storage.snapshot_info(run, 1)["samples"] == 200
        out = storage.load_snapshot(run, 0)
        np.testing.assert_array_equal(out["b"], tree["b"])

        storage.save_raw(run, "model", {"arch": "fc", "width": 8})
        assert storage.load_raw(run, "model")["width"] == 8


def test_storage_throttle():
    with mock_dir():
        run = runs.new_run()
        assert storage.throttled_latest(run, {"x": np.ones(1)}, throttle=3600)
        assert not storage.throttled_latest(run, {"x": np.ones(1)}, throttle=3600)


def test_logs():
    with mock_dir():
        run = runs.new_run()
        with logs.to_run(run):
            logging.getLogger("demo").info("hello from the run")
        assert "hello from the run" in logs.tail(run)


def test_logs_follow():
    with mock_dir():
        run = runs.new_run()
        with logs.to_run(run):
            logging.getLogger("demo").info("line one")
            gen = logs.follow(run, poll=0.01)
            assert "line one" in next(gen)
            logging.getLogger("demo").info("line two")
            assert "line two" in next(gen)
