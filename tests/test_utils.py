"""Utility-layer tests: pools, profiling gates, memory accounting, archive,
monitoring."""
import logging
import os

import numpy as np
import pytest

from boardlaw_tpu.pavlov import archive, monitoring, runs, stats
from boardlaw_tpu.pavlov.tests import mock_dir
from boardlaw_tpu.utils import memory, parallel, profiling


def _square(x):
    return x * x


def test_serial_executor():
    assert parallel.parallel(_square, [1, 2, 3], kind="serial") == [1, 4, 9]


def test_thread_executor():
    assert parallel.parallel(_square, [1, 2, 3], kind="thread") == [1, 4, 9]


def test_process_executor():
    assert parallel.parallel(_square, [1, 2, 3], kind="process", max_workers=2) == [1, 4, 9]


def test_serial_raises():
    def boom(x):
        raise ValueError("nope")

    with pytest.raises(ValueError):
        parallel.parallel(boom, [1], kind="serial")


def test_nvtx_gate(monkeypatch):
    calls = []

    @profiling.nvtx
    def fn(x):
        calls.append(x)
        return x + 1

    monkeypatch.delenv("BOARDLAW_PROFILE", raising=False)
    assert fn(1) == 2
    monkeypatch.setenv("BOARDLAW_PROFILE", "1")
    assert fn(2) == 3
    assert calls == [1, 2]


def test_memory_stats():
    s = memory.stats()
    assert isinstance(s, dict)
    m = memory.Monitor()
    m.snap("a")
    m.snap("b")
    df = m.pandas()
    assert list(df.label) == ["a", "b"]



def test_archive_roundtrip(tmp_path):
    (tmp_path / "mod.py").write_text("VALUE = 42\n")
    with mock_dir():
        run = runs.new_run()
        archive.archive(run, dir=tmp_path)
        assert "mod.py" in archive.listing(run)
        assert "VALUE = 42" in archive.source(run, "mod.py")
        # idempotent
        archive.archive(run, dir=tmp_path)


def test_monitoring_tree():
    with mock_dir():
        run = runs.new_run()
        with stats.to_run(run):
            stats.mean("loss.policy", 1.0)
            stats.mean("loss.value", 2.0)
            stats.rate("sample-rate", 100)
        view = monitoring.tree_view(run, "1h")
        assert "loss" in view and "policy" in view
        fig = monitoring.plot(run, rule="1h")
        assert fig is not None
