"""Results database: runs / snaps / agents / trials in SQLite.

Reference counterpart: boardlaw/sql.py — same schema (runs, snaps, agents,
trials, mohex_trials, noise_scales plus the agents_details join view,
sql.py:24-189) on stdlib sqlite3 instead of SQLAlchemy. The ingestion path
(`refresh`) walks the pavlov run registry and registers every run, snapshot
and default test-search agent (sql.py:191-223).
"""
from __future__ import annotations

import os
import sqlite3
from contextlib import contextmanager
from logging import getLogger
from pathlib import Path

import pandas as pd

from .pavlov import runs, storage as pstorage

log = getLogger(__name__)

SCHEMA = """
create table if not exists runs (
    run text primary key,
    description text,
    boardsize integer,
    width integer,
    depth integer,
    nodes integer);

create table if not exists snaps (
    id integer primary key autoincrement,
    run text references runs(run),
    idx integer,
    samples real,
    flops real,
    unique(run, idx));

create table if not exists agents (
    id integer primary key autoincrement,
    snap integer references snaps(id),
    nodes integer,
    c real,
    unique(snap, nodes, c));

create table if not exists trials (
    id integer primary key autoincrement,
    black_agent integer references agents(id),
    white_agent integer references agents(id),
    black_wins integer,
    white_wins integer,
    moves integer,
    times real);

create table if not exists mohex_trials (
    id integer primary key autoincrement,
    black_agent integer,
    white_agent integer,
    black_wins integer,
    white_wins integer,
    moves integer,
    times real);

create table if not exists noise_scales (
    id integer primary key autoincrement,
    agent_id integer references agents(id),
    kind text,
    mean_sq real,
    sq_mean real,
    variance real,
    n_params real,
    batch_size real,
    batches real);
"""

VIEW = """
create view if not exists agents_details as
select
    agents.id, agents.nodes as test_nodes, agents.c as test_c,
    snaps.id as snap_id, snaps.samples, snaps.flops as train_flops, snaps.idx,
    runs.run, runs.description, runs.boardsize, runs.width, runs.depth,
    runs.nodes as train_nodes
from agents
    inner join snaps on (agents.snap == snaps.id)
    inner join runs on (snaps.run == runs.run)
"""


def database_path():
    return Path(os.environ.get("BOARDLAW_DB", "output/experiments/eval/database.sql"))


@contextmanager
def connection():
    p = database_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    conn = sqlite3.connect(p)
    try:
        conn.executescript(SCHEMA)
        conn.execute(VIEW)
        yield conn
        conn.commit()
    finally:
        conn.close()


def query(q, *args):
    """Parameterised select -> dataframe (reference sql.py:230-236)."""
    with connection() as conn:
        return pd.read_sql_query(q, conn, params=args)


def execute(q, *args):
    """Parameterised write (reference sql.py:238-241)."""
    with connection() as conn:
        conn.execute(q, args)


# -- ingestion --------------------------------------------------------------

def refresh():
    """Register every pavlov run, its snapshots, and a default test-search
    agent per snapshot (reference sql.py:191-223)."""
    with connection() as conn:
        for run in runs.list_runs():
            info = runs.info(run)
            params = info.get("params", {})
            if "boardsize" not in params:
                continue
            conn.execute(
                "insert or ignore into runs (run, description, boardsize, width, depth, nodes)"
                " values (?,?,?,?,?,?)",
                (
                    run,
                    info.get("description", ""),
                    params.get("boardsize"),
                    params.get("width"),
                    params.get("depth"),
                    params.get("nodes", 64),
                ),
            )
            for idx, path in pstorage.snapshots(run).items():
                meta = pstorage.snapshot_info(run, idx)
                conn.execute(
                    "insert or ignore into snaps (run, idx, samples, flops) values (?,?,?,?)",
                    (run, idx, meta.get("n_samples"), meta.get("n_flops")),
                )
                snap_id = conn.execute(
                    "select id from snaps where run=? and idx=?", (run, idx)
                ).fetchone()[0]
                conn.execute(
                    "insert or ignore into agents (snap, nodes, c) values (?,?,?)",
                    (snap_id, params.get("nodes", 64), params.get("c_puct", 1 / 16)),
                )


# -- queries ----------------------------------------------------------------

def agent_query():
    """agents_details as a dataframe indexed by agent id (reference
    sql.py:248-261)."""
    with connection() as conn:
        return pd.read_sql_query("select * from agents_details", conn, index_col="id")


def trial_query(boardsize=None, desc=None):
    """Trials joined to both agents' details (reference sql.py:263-287)."""
    q = """
        select trials.*, b.boardsize as boardsize, b.description as description
        from trials
        inner join agents_details b on (trials.black_agent == b.id)
    """
    clauses, args = [], []
    if boardsize is not None:
        clauses.append("b.boardsize = ?")
        args.append(boardsize)
    if desc is not None:
        clauses.append("b.description like ?")
        args.append(desc)
    if clauses:
        q += " where " + " and ".join(clauses)
    with connection() as conn:
        return pd.read_sql_query(q, conn, params=args, index_col="id")


def save_trials(rows):
    """Persist trial outcomes: iterable of (black_agent, white_agent,
    black_wins, white_wins, moves, times) (reference sql.py:289-301)."""
    with connection() as conn:
        conn.executemany(
            "insert into trials (black_agent, white_agent, black_wins, white_wins, moves, times)"
            " values (?,?,?,?,?,?)",
            list(rows),
        )


def save_mohex_trials(rows):
    with connection() as conn:
        conn.executemany(
            "insert into mohex_trials (black_agent, white_agent, black_wins, white_wins, moves, times)"
            " values (?,?,?,?,?,?)",
            list(rows),
        )


def save_noise_scale(agent_id, kind, **fields):
    with connection() as conn:
        conn.execute(
            "insert into noise_scales (agent_id, kind, mean_sq, sq_mean, variance, n_params, batch_size, batches)"
            " values (?,?,?,?,?,?,?,?)",
            (
                agent_id,
                kind,
                fields.get("mean_sq"),
                fields.get("sq_mean"),
                fields.get("variance"),
                fields.get("n_params"),
                fields.get("batch_size"),
                fields.get("batches"),
            ),
        )


def mohex_trial_query():
    with connection() as conn:
        return pd.read_sql_query("select * from mohex_trials", conn, index_col="id")
