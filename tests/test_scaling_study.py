"""CPU smoke of the end-to-end scaling-study driver (scripts/scaling_study.py):
tiny runs -> snapshots -> league evaluation -> trials rows -> frontier fit +
figure. Mirrors the reference's full pipeline (main.py train -> arena/neural
league -> sql -> analysis/data.py fit) at toy scale."""
import argparse
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from boardlaw_tpu import sql, train
from boardlaw_tpu.pavlov import storage as pstorage
from boardlaw_tpu.pavlov.tests import mock_dir

from scripts import scaling_study


@pytest.fixture
def db(tmp_path, monkeypatch):
    monkeypatch.setenv("BOARDLAW_DB", str(tmp_path / "db.sql"))
    yield tmp_path


def _args(**kw):
    base = dict(boardsize=3, envs=8, steps=2, sizes="4:1,8:1",
                envs_per=2, league_envs=8, k=1, dtype="float32",
                test_k=1, seed=0)
    base.update(kw)
    return argparse.Namespace(**base)


def test_scaling_study_pipeline(db, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # fit() writes output/ under cwd
    args = _args()
    with mock_dir():
        # train stage at toy scale; snapshots won't trigger at these FLOPs,
        # so register the final state as a snapshot per run (two FLOP points
        # per run so each run contributes a curve segment)
        runs_done = []
        for width, depth in scaling_study.parse_sizes(args.sizes):
            run = train.run(
                args.boardsize, width, depth, desc=scaling_study.DESC,
                n_envs=args.envs, nodes=4, mix_steps=4, buffer_len=4,
                max_steps=args.steps, storer="flops",
            )
            sd = pstorage.load_latest(run)
            f0 = 1e9 * (width / 4)
            pstorage.save_snapshot(run, {"agent": sd["agent"]},
                                   n_samples=8.0, n_flops=f0)
            pstorage.save_snapshot(run, {"agent": sd["agent"]},
                                   n_samples=16.0, n_flops=4 * f0)
            runs_done.append(run)

        scaling_study.evaluate(args)
        trials = sql.trial_query(args.boardsize, scaling_study.DESC)
        assert len(trials) > 0
        n_agents = len(sql.agent_query())
        assert n_agents == 4
        # every ordered pair got games
        assert len(trials) == n_agents * (n_agents - 1)
        assert (trials.black_wins + trials.white_wins > 0).all()

        # idempotent: a rerun adds nothing (all matchups seen)
        scaling_study.evaluate(args)
        assert len(sql.trial_query(args.boardsize, scaling_study.DESC)) == len(trials)

        scaling_study.fit(args)
        assert os.path.exists("output/experiments/scaling/frontier_b3.csv")
        assert os.path.exists("output/experiments/scaling/flops_curves_b3.png")
        assert os.path.exists("output/experiments/scaling/fit_b3.json")
