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


def test_stats_new_kinds_roundtrip():
    # the reference's full kind list round-trips (kinds.py:7-84)
    with mock_dir():
        run = runs.new_run()
        with stats.to_run(run):
            stats.std("spread", 1.0)
            stats.std("spread", 3.0)
            stats.period("save-period", 1)
            stats.period("save-period", 1)
            stats.max_percent("util.max", 0.5)
            stats.max_percent("util.max", 0.25)
            stats.mean_percent("util.mean", 0.5)
            stats.mean_percent("util.mean", 0.25)
            stats.quantiles("q.loss", np.array([0.1, 0.5, 0.9]))
            stats.quantiles("q.loss", np.array([0.3, 0.7, 1.1]))
            stats.line("raw", 2.0)
            stats.line("raw", 4.0)

        spread = stats.resampled(run, "spread", "1h").dropna()
        np.testing.assert_allclose(spread.iloc[-1], np.std([1.0, 3.0], ddof=1))

        period = stats.resampled(run, "save-period", "1h").dropna()
        assert period.iloc[-1] == 3600 / 2  # 2 events in a 1h window

        assert stats.resampled(run, "util.max", "1h").dropna().iloc[-1] == 0.5
        assert stats.resampled(run, "util.mean", "1h").dropna().iloc[-1] == 0.375

        q = stats.resampled(run, "q.loss", "1h").dropna()
        np.testing.assert_allclose(q.iloc[-1][["q0", "q1", "q2"]], [0.2, 0.6, 1.0])

        assert stats.resampled(run, "raw", "1h").dropna().iloc[-1] == 3.0
        assert stats.KINDS["max_percent"].percent


def test_stats_dataframe():
    with mock_dir():
        run = runs.new_run()
        with stats.to_run(run):
            stats.mean("loss", 4.0)
            stats.mean_std("elo", 0.5, 0.1)
        df = stats.dataframe(run, "1h")
        assert "loss" in df.columns
        assert "elo.mu" in df.columns and "elo.sigma" in df.columns
        assert df["loss"].dropna().iloc[-1] == 4.0


def test_logs_from_run_forwarding():
    # a writer process logs into the run; the from_run thread forwards the
    # lines into our buffer (reference logs.py:150-193 + tests :202-250)
    import io
    import multiprocessing as mp
    import time as _time

    from boardlaw_tpu.pavlov import tests as ptests

    with mock_dir() as root:
        run = runs.new_run()
        ctx = mp.get_context("spawn")
        p = ctx.Process(target=_log_writer_child, args=(str(root), run))
        buf = io.StringIO()
        with logs.from_run(run, out=buf, poll=0.05):
            p.start()
            p.join(timeout=60)
            deadline = _time.time() + 10
            while "hello from child" not in buf.getvalue() and _time.time() < deadline:
                _time.sleep(0.05)
        assert p.exitcode == 0
        assert "hello from child" in buf.getvalue()


def _log_writer_child(root, run):
    import logging as _logging
    import os

    os.environ["BOARDLAW_RUN_ROOT"] = root
    from boardlaw_tpu.pavlov import logs as _logs

    with _logs.to_run(run):
        _logging.getLogger("child").info("hello from child")
