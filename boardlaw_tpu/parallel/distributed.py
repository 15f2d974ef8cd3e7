"""Multi-process / multi-host runtime: `jax.distributed` wiring.

Reference analog: the reference has NO in-run distribution — jittens ships
whole runs to machines (cloud/jittens/manage.py:67-137). Here scale-out is
*in-program*: N host processes (one per TPU host) connect through
`jax.distributed.initialize` into a single JAX runtime whose devices form one
global `Mesh`; the already-jitted train step then partitions over it under
GSPMD, with the learner's gradient psum riding ICI within a slice and DCN
across slices. On CPU (tests, this container) the same path runs with
`jax_num_cpu_devices` virtual devices per process and gloo collectives.

Process wiring comes from FLEET_* env vars, so `fleet` machines can launch
workers exactly like any other job:

    FLEET_COORD      coordinator address host:port (process 0 hosts it)
    FLEET_NUM_PROCS  world size
    FLEET_PROC_ID    this process's rank
"""
from __future__ import annotations

import os
from logging import getLogger

log = getLogger(__name__)


def initialize(
    coordinator=None,
    num_processes=None,
    process_id=None,
    local_device_count=None,
    platform=None,
):
    """Connect this process into the global JAX runtime.

    On TPU pods, all arguments are auto-detected by jax.distributed; pass
    them explicitly (or via FLEET_* env vars) for CPU tests and manual
    clusters. `local_device_count` forces N virtual CPU devices per process.
    Returns the (num_processes, process_id) actually used.
    """
    import jax

    coordinator = coordinator or os.environ.get("FLEET_COORD")
    if num_processes is None and os.environ.get("FLEET_NUM_PROCS"):
        num_processes = int(os.environ["FLEET_NUM_PROCS"])
    if process_id is None and os.environ.get("FLEET_PROC_ID"):
        process_id = int(os.environ["FLEET_PROC_ID"])

    platforms = (jax.config.jax_platforms or "").split(",")
    want_cpu = platform == "cpu" or (platform is None and platforms[:1] != ["tpu"])
    if want_cpu and local_device_count:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", int(local_device_count))
        except RuntimeError:
            # a backend already exists (e.g. sitecustomize touched it):
            # rebuild from scratch so the device count takes effect
            from jax.extend import backend as _backend

            _backend.clear_backends()
            jax.config.update("jax_num_cpu_devices", int(local_device_count))

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
    )
    return jax.process_count(), jax.process_index()


def global_state(state, mesh, axis="dp"):
    """Reshard a process-locally-computed TrainState onto a global mesh.

    Every process computes the identical initial state (same PRNG seed), so
    the host values are replicated by construction; device_put with global
    shardings then keeps only each process's addressable shards.
    """
    import jax
    import numpy as np

    from .mesh import shard_train_state

    host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state)
    return shard_train_state(host, mesh, axis=axis)


def worker_demo(boardsize=3, width=4, depth=1, envs_per_device=2, seed=0):
    """One sharded train step over the global mesh — the end-to-end payload
    for multi-process tests. Returns a JSON-able summary dict."""
    import jax

    from ..train import TrainConfig, make_train
    from .mesh import make_mesh

    n = len(jax.devices())
    cfg = TrainConfig(
        boardsize=boardsize,
        width=width,
        depth=depth,
        n_envs=envs_per_device * n,
        buffer_len=4,
        n_nodes=4,
        mix_steps=4,
        seed=seed,
    )
    model, opt, init, warmup, train_step = make_train(cfg)

    mesh = make_mesh(n)
    state = init(jax.random.PRNGKey(cfg.seed))
    state = global_state(state, mesh)
    state = warmup(state, chunk=4)
    state, aux = train_step(state)
    jax.block_until_ready(aux["loss.total"])
    return {
        "process": jax.process_index(),
        "n_processes": jax.process_count(),
        "n_devices": n,
        "loss": float(aux["loss.total"]),
        "step": int(state.step),
    }


def worker_main():
    """Entrypoint for fleet-launched distributed workers: initialize from
    FLEET_* env vars, run the demo payload, write output/result.json."""
    import json
    import pathlib

    initialize(local_device_count=int(os.environ.get("FLEET_LOCAL_DEVICES", "0")) or None)
    out = worker_demo()
    pathlib.Path("output").mkdir(exist_ok=True)
    with open(f"output/result-{out['process']}.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    worker_main()
