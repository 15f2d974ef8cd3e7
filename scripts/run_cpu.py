"""Run a repo script pinned to the CPU backend (the container's
sitecustomize pre-imports jax with the axon TPU platform; env vars are too
late — see CLAUDE.md). Usage: python scripts/run_cpu.py <script> [args...]"""
import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.argv = sys.argv[1:]
sys.path.insert(0, "/root/repo")
runpy.run_path(sys.argv[0], run_name="__main__")
