"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CPU/CUDA duality testing device (SURVEY.md §4.4): all
logic must run identically on CPU, and multi-chip sharding is validated with
`--xla_force_host_platform_device_count` instead of real hardware.

Note: the environment may import jax at interpreter startup (sitecustomize),
so env vars alone are too late — use jax.config.update.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
