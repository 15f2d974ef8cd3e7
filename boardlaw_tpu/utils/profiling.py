"""Profiling annotations and trace capture.

Reference counterpart: rebar/profiling.py — `@nvtx` range decorators gated on
EMIT_NVTX (:15-41) and `profilable` entry-point wrapping (:43-56). The TPU
equivalents: `jax.profiler.TraceAnnotation` named ranges (visible in
XProf/TensorBoard) gated on BOARDLAW_PROFILE, and `profilable` capturing a
full device trace to a directory.

Recipe (reference documented nsys/ncu invocations in its docstring):
    BOARDLAW_PROFILE=1 python train.py            # annotate ranges
    with profiling.trace('/tmp/trace'): step()    # capture a device trace
    tensorboard --logdir /tmp/trace               # inspect in xprof
"""
from __future__ import annotations

import os
from contextlib import contextmanager
from functools import wraps

import jax


def enabled():
    return os.environ.get("BOARDLAW_PROFILE", "") == "1"


def nvtx(fn):
    """Named-range decorator; no-op unless BOARDLAW_PROFILE=1 (reference
    profiling.py:15-28)."""

    @wraps(fn)
    def wrapped(*args, **kwargs):
        if not enabled():
            return fn(*args, **kwargs)
        with jax.profiler.TraceAnnotation(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapped


@contextmanager
def trace(logdir):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profilable(fn):
    """Wrap an entry point so BOARDLAW_PROFILE_DIR captures its trace
    (reference profiling.py:43-56)."""

    @wraps(fn)
    def wrapped(*args, **kwargs):
        logdir = os.environ.get("BOARDLAW_PROFILE_DIR")
        if not logdir:
            return fn(*args, **kwargs)
        with trace(logdir):
            return fn(*args, **kwargs)

    return wrapped
