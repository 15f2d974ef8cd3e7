"""Experiment tracking: run registry, file registry, stats time-series,
checkpoints, logs.

Reference counterpart: the `pavlov` package (SURVEY.md §2.3). Same design:
every run owns a directory `ROOT/<run-name>/` with an `_info.json` metadata
record; every file in it is registered with provenance; stats are append-only
structured-array time-series whose *kind* (mean/rate/cumsum/...) determines
resampling at read time; checkpoints are atomic-rename writes.
"""
from . import runs, files, storage, stats, logs  # noqa: F401
