"""Per-run source snapshot for reproducibility.

Reference counterpart: pavlov/archive.py — a tarball of the tracked source
tree stored in each run dir at creation (:9-22), so any run can be rerun
against the exact code that produced it.
"""
from __future__ import annotations

import subprocess
import tarfile
from logging import getLogger
from pathlib import Path

from . import files, runs

log = getLogger(__name__)

NAME = "source.tar.gz"


def _tracked(dir):
    """git-tracked files if available, else all .py under the dir."""
    try:
        out = subprocess.run(
            ["git", "ls-files"], cwd=dir, capture_output=True, text=True, check=True
        )
        return [f for f in out.stdout.splitlines() if f.strip()]
    except Exception:
        return [str(p.relative_to(dir)) for p in Path(dir).rglob("*.py")]


def archive(run, dir="."):
    """Store the source snapshot in the run dir (reference archive.py:9-22)."""
    run = runs.resolve(run)
    dir = Path(dir)
    if NAME in runs.info(run).get("_files", {}):
        return files.path(run, NAME)
    p = files.new_file(run, NAME)
    with tarfile.open(p, "w:gz") as tar:
        for f in _tracked(dir):
            src = dir / f
            if src.exists() and src.is_file():
                tar.add(src, arcname=f)
    return p


def source(run, path):
    """Read one file out of a run's source snapshot (reference
    archive.py:40-60's viewer, minus the notebook)."""
    run = runs.resolve(run)
    with tarfile.open(files.path(run, NAME)) as tar:
        return tar.extractfile(path).read().decode()


def listing(run):
    run = runs.resolve(run)
    with tarfile.open(files.path(run, NAME)) as tar:
        return tar.getnames()
