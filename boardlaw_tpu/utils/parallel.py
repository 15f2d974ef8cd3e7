"""Process/thread pools with a switchable executor and submit/wait sugar.

Reference counterpart: rebar/parallel.py — `SerialExecutor` for debugging
(:15-26), a CUDA-pinning pool (:28-57), the `VariableExecutor` switch
(:61-82) and the `parallel()` convenience wrapper (:85-142).

TPU note: the reference pins each worker to a GPU via CUDA_VISIBLE_DEVICES;
here `DeviceExecutor` pins workers to *platforms* (e.g. forces CPU in
children so they never contend for the training chip — the pattern the live
arena uses).
"""
from __future__ import annotations

import concurrent.futures
import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from logging import getLogger

log = getLogger(__name__)


class SerialExecutor:
    """Runs submissions immediately in-process — the debuggable executor
    (reference parallel.py:15-26)."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def submit(self, fn, *args, **kwargs):
        f = concurrent.futures.Future()
        try:
            f.set_result(fn(*args, **kwargs))
        except Exception as e:
            f.set_exception(e)
        return f

    def shutdown(self, wait=True):
        pass


def _pin_platform(platform):
    os.environ["JAX_PLATFORMS"] = platform
    try:
        import jax

        jax.config.update("jax_platforms", platform)
    except Exception:
        pass


class DeviceExecutor(ProcessPoolExecutor):
    """Process pool whose workers are pinned to a jax platform (reference's
    CUDAPoolExecutor pinned workers to GPU indices, parallel.py:28-57)."""

    def __init__(self, max_workers=None, platform="cpu", **kwargs):
        import multiprocessing as mp

        super().__init__(
            max_workers=max_workers,
            mp_context=mp.get_context("spawn"),
            initializer=_pin_platform,
            initargs=(platform,),
            **kwargs,
        )


def executor(kind="process", max_workers=None):
    """The switchable executor factory (reference VariableExecutor,
    parallel.py:61-82)."""
    if kind == "serial":
        return SerialExecutor()
    if kind == "thread":
        return ThreadPoolExecutor(max_workers=max_workers)
    if kind == "process":
        import multiprocessing as mp

        return ProcessPoolExecutor(max_workers=max_workers, mp_context=mp.get_context("spawn"))
    if kind == "device":
        return DeviceExecutor(max_workers=max_workers)
    raise ValueError(f"unknown executor kind {kind!r}")


def parallel(fn, items, kind="process", max_workers=None, progress=False):
    """Map fn over items with the chosen executor; preserves order and
    re-raises the first failure (reference parallel.py:85-142)."""
    with executor(kind, max_workers) as ex:
        futures = [ex.submit(fn, item) for item in items]
        out = []
        for i, f in enumerate(futures):
            out.append(f.result())
            if progress:
                log.info(f"parallel: {i + 1}/{len(futures)}")
        return out
