"""Device-memory accounting.

Reference counterpart: rebar/memory.py (line-level CUDA memory profiler).
TPU equivalent: `device.memory_stats()` snapshots with labelled deltas — the
granularity XLA gives us (allocations happen at compile/execute boundaries,
not per line).
"""
from __future__ import annotations

from contextlib import contextmanager
from logging import getLogger

import jax
import pandas as pd

log = getLogger(__name__)


def stats(device=None):
    device = device or jax.devices()[0]
    s = device.memory_stats() or {}
    return dict(s)


def usage(device=None):
    """(bytes_in_use, bytes_limit) if the backend reports them."""
    s = stats(device)
    return s.get("bytes_in_use", 0), s.get("bytes_limit", 0)


class Monitor:
    """Collects labelled memory snapshots and renders a delta table
    (the reference's per-line accumulator, memory.py:18-66, at
    checkpoint granularity)."""

    def __init__(self, device=None):
        self.device = device or jax.devices()[0]
        self.snaps = []

    def snap(self, label):
        self.snaps.append((label, stats(self.device)))

    def pandas(self):
        rows = []
        prev = None
        for label, s in self.snaps:
            row = {"label": label, "bytes_in_use": s.get("bytes_in_use", 0)}
            row["delta"] = row["bytes_in_use"] - (prev or row["bytes_in_use"])
            prev = row["bytes_in_use"]
            rows.append(row)
        return pd.DataFrame(rows)


@contextmanager
def report(label="region", device=None):
    """Log the memory delta of a region."""
    before, _ = usage(device)
    yield
    after, limit = usage(device)
    log.info(
        f"memory[{label}]: {(after - before) / 2**20:+.1f} MiB "
        f"({after / 2**20:.0f} MiB in use of {limit / 2**20:.0f})"
    )
