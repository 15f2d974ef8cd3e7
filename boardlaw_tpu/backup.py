"""Run-archive sync: mirror the experiment store to/from a backup target.

Reference counterpart: boardlaw/backup.py — b2sdk sync of `output/pavlov`
plus per-run/per-file download helpers (:34-117). This build has no cloud
egress, so the target is any rsync-able destination (a mounted bucket, NFS
path, or `user@host:path`); the sync semantics (one-way mirror of the run
store, per-run fetch) are the same.
"""
from __future__ import annotations

import subprocess
from logging import getLogger
from pathlib import Path

from .pavlov import runs

log = getLogger(__name__)


def _rsync(src, dst, delete=False):
    import shutil

    if shutil.which("rsync") is None:
        # local-path fallback when no rsync binary exists
        src_dir = Path(str(src).rstrip("/"))
        dst_dir = Path(str(dst).rstrip("/"))
        if delete and dst_dir.exists():
            shutil.rmtree(dst_dir)
        shutil.copytree(src_dir, dst_dir, dirs_exist_ok=True)
        return
    cmd = ["rsync", "-az"] + (["--delete"] if delete else []) + [str(src), str(dst)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"rsync failed: {r.stderr.strip()}")


def backup(target, delete=False):
    """Mirror the whole run store to the target (reference backup.py:34-60)."""
    src = runs.root()
    _rsync(f"{src}/", f"{target}/", delete=delete)
    log.info(f"backed up {src} -> {target}")


def fetch(target):
    """Mirror the target back into the local run store (reference
    backup.py:62-80)."""
    dst = runs.root()
    _rsync(f"{target}/", f"{dst}/", delete=False)
    log.info(f"fetched {target} -> {dst}")


def fetch_run(target, run):
    """Fetch one run directory (reference download_agent, backup.py:82-117)."""
    dst = runs.root() / run
    dst.mkdir(parents=True, exist_ok=True)
    _rsync(f"{Path(target) / run}/", f"{dst}/")
    return dst
