"""Fleet orchestration: farm training jobs out to machines.

Reference counterpart: the `jittens` package plus `cloud/` (SURVEY.md §1 L9):
a JSON job registry, machine plugins (local subprocess / ssh), a first-fit
scheduler with PID-liveness polling, result fetching, and a dedupe-aware
sweep driver. TPU differences: "resources" are device counts (chips) instead
of GPU indices, and job payloads launch `boardlaw_tpu.train` entrypoints
parameterised via FLEET_PARAMS.
"""
from . import jobs, machines, manage, local, sweep  # noqa: F401
from .jobs import submit  # noqa: F401
from .manage import refresh, fetch, cleanup  # noqa: F401
