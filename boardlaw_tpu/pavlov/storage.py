"""Checkpointing: latest / numbered snapshots / named raw objects.

Reference counterpart: pavlov/storage.py. Three categories, same contract:
  latest            — overwritten in place, with a throttled variant (:63-83)
  snapshot.{n}      — numbered, append-only (:85-104)
  named.{name}      — arbitrary pickled objects, e.g. the model object (:129-152)
All writes are atomic tmp+rename (:50-58).

State trees (params/opt-state pytrees of arrays) are serialized with flax's
msgpack; arbitrary objects with cloudpickle.
"""
from __future__ import annotations

import os
import pickle
import tempfile
import time

import cloudpickle
import jax
import numpy as np
from flax import serialization

from . import files, runs

_LATEST_THROTTLE = {}


def _atomic_write(path, payload: bytes):
    path = str(path)
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _to_host(tree):
    # one batched device_get instead of a per-leaf np.asarray loop: on the
    # remote-tunnel backend every transfer pays RTT, and per-leaf fetches
    # from a long-lived process have been observed to wedge for minutes
    return jax.device_get(tree)


def state_bytes(tree):
    return serialization.msgpack_serialize(_to_host(tree))


def state_from_bytes(payload):
    return serialization.msgpack_restore(payload)


# -- latest -----------------------------------------------------------------

def save_latest(run, tree):
    run = runs.resolve(run)
    name = "storage.latest.pkl"
    if name not in runs.info(run).get("_files", {}):
        files.new_file(run, name)
    _atomic_write(files.path(run, name), state_bytes(tree))


def throttled_latest(run, tree, throttle=60):
    """Overwrite `latest` at most every `throttle` seconds
    (reference storage.py:74-83)."""
    key = (runs.resolve(run),)
    now = time.monotonic()
    if now - _LATEST_THROTTLE.get(key, -float("inf")) >= throttle:
        save_latest(run, tree)
        _LATEST_THROTTLE[key] = now
        return True
    return False


def load_latest(run):
    run = runs.resolve(run)
    with open(files.path(run, "storage.latest.pkl"), "rb") as f:
        return state_from_bytes(f.read())


def has_latest(run):
    return files.path(runs.resolve(run), "storage.latest.pkl").exists()


# -- numbered snapshots -----------------------------------------------------

def save_snapshot(run, tree, **kwargs):
    run = runs.resolve(run)
    p = files.new_file(run, "storage.snapshot.{n}.pkl", **kwargs)
    _atomic_write(p, state_bytes(tree))
    return p


def snapshots(run):
    """{index: path} of saved snapshots (reference storage.py:96-104)."""
    run = runs.resolve(run)
    return {n: files.path(run, f) for n, f in files.seq(run, "storage.snapshot.{n}.pkl")}


def load_snapshot(run, n):
    with open(snapshots(run)[n], "rb") as f:
        return state_from_bytes(f.read())


def snapshot_info(run, n):
    return files.info(run, f"storage.snapshot.{n}.pkl")


# -- named raw objects ------------------------------------------------------

def save_raw(run, name, obj):
    """Pickle an arbitrary object (e.g. the model definition) so consumers
    needn't rebuild it from code (reference storage.py:129-152)."""
    run = runs.resolve(run)
    fname = f"storage.named.{name}.pkl"
    if fname not in runs.info(run).get("_files", {}):
        files.new_file(run, fname)
    _atomic_write(files.path(run, fname), cloudpickle.dumps(obj))


def load_raw(run, name):
    with open(files.path(runs.resolve(run), f"storage.named.{name}.pkl"), "rb") as f:
        return pickle.load(f)
