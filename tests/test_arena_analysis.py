"""Arena analysis + activelo plot + backup sync tests."""
import numpy as np
import jax
import pytest

from boardlaw_tpu import backup
from boardlaw_tpu.activelo import plot as aplot
from boardlaw_tpu.arena import analysis as aanalysis, live
from boardlaw_tpu.envs import validation
from boardlaw_tpu.pavlov import runs
from boardlaw_tpu.pavlov.tests import mock_dir


def test_activelo_example():
    soln, picks = aplot.example(n_agents=4, n_rounds=20)
    # active matchmaking should recover the ordering roughly
    mu = np.asarray(soln.mu)
    assert mu[0] > mu[-1]
    assert len(picks) == 20
    fig = aplot.diagnostics(soln, names=list("abcd"))
    assert fig is not None


def test_arena_analysis_pipeline():
    with mock_dir():
        run = runs.new_run(boardsize=3)
        live.record_result(run, "a", "b", 7, 3)
        live.record_result(run, "b", "a", 4, 6)
        soln = aanalysis.solution(run)
        d, s = aanalysis.difference(soln, "a", "b")
        assert d > 0  # a won 13 of 20
        df = aanalysis.elos(run)
        assert df.index[0] == "a"
        assert aanalysis.errorbars(run) is not None
        assert aanalysis.winrate_heatmap(run) is not None
        assert aanalysis.nontransitivity(run) is not None


def test_backup_sync(tmp_path):
    with mock_dir():
        run = runs.new_run(description="to-backup")
        target = tmp_path / "mirror"
        target.mkdir()
        backup.backup(target)
        assert (target / run / "_info.json").exists()

    # fetch into a fresh store
    with mock_dir():
        backup.fetch(target)
        assert runs.exists(run)
