"""Device health stats: TPU memory/utilisation polling into stat channels.

Reference counterpart: pavlov/stats/gpu.py — nvidia-smi CSV polling and torch
peak-memory counters (:9-70). TPU equivalent: `device.memory_stats()` from
the PJRT backend, throttled the same way.
"""
from __future__ import annotations

import time

import jax

from . import stats

_last = {}


def device(throttle=15, dev=None):
    """Write device memory stats channels at most every `throttle` seconds
    (reference gpu.py:39-70's throttling)."""
    now = time.monotonic()
    if now - _last.get("device", -float("inf")) < throttle:
        return
    _last["device"] = now

    dev = dev or jax.devices()[0]
    s = dev.memory_stats() or {}
    in_use = s.get("bytes_in_use", 0)
    limit = s.get("bytes_limit", 0)
    peak = s.get("peak_bytes_in_use", 0)
    stats.mean("device.memory-in-use", in_use / 2**20)
    if limit:
        stats.mean("device.memory-percent", 100 * in_use / limit)
    if peak:
        stats.max("device.memory-peak", peak / 2**20)


# register on the stats namespace for API parity with `stats.gpu(...)`
stats.device = device
