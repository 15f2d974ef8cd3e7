"""Benchmark: prints ONE JSON line with the headline per-chip throughput.

North-star metrics (BASELINE.md): env-steps/s and MCTS sims/s per chip at
9x9 Hex. The headline value is raw env-step throughput (the reference's
hex step+observe kernel benchmark, boardlaw/hex/tests.py:186-215, scaled up);
`mcts_sims_per_s` covers the full search pipeline (descend + env step +
network eval + backup) with the best-known 9x9 network (512x4).

vs_baseline is measured against the driver's multi-host aggregate target of
10M env-steps/s (BASELINE.json) — per-chip fractions of that target.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def bench_env_steps(n_envs, boardsize, n_steps=1024, reps=4):
    """TIMING CONTRACT (r2 VERDICT weak #1 root cause): on the axon remote
    backend `block_until_ready` returns BEFORE compute finishes — only a
    host transfer truly syncs. r01/r02's 7-9M env-steps/s were therefore
    measuring per-call RPC dispatch latency, not chip compute (the real rate
    is ~5x higher). So: one long scan per dispatch (amortizes the ~60ms
    dispatch + ~20ms fetch RTT to <3%), a float() host fetch as the fence,
    and best-of-N so one contended rep can't move the headline."""
    from boardlaw_tpu.envs import hex

    world0 = hex.Hex.initial(n_envs, boardsize)

    @jax.jit
    def roll(world, key):
        def body(carry, _):
            world, key = carry
            key, sub = jax.random.split(key)
            logits = jnp.where(world.valid, 0.0, -jnp.inf)
            actions = jax.random.categorical(sub, logits, axis=-1)
            world, transition = world.step(actions)
            return (world, key), transition.terminal.sum()

        (world, key), term = jax.lax.scan(body, (world, key), None, length=n_steps)
        return world, term.sum()

    key = jax.random.PRNGKey(0)
    _, nt = roll(world0, key)  # compile + warm
    float(nt)  # host fetch = true sync

    best = 0.0
    for i in range(reps):
        t0 = time.perf_counter()
        _, nt = roll(world0, jax.random.fold_in(key, i))
        float(nt)
        best = max(best, n_envs * n_steps / (time.perf_counter() - t0))
    return best


def bench_mcts(n_envs, boardsize, width, depth, n_nodes, reps=3):
    from boardlaw_tpu.envs import hex
    from boardlaw_tpu.mcts import MCTSConfig, mcts, root
    from boardlaw_tpu.train import TrainConfig, build_model

    cfg = TrainConfig(
        boardsize=boardsize, width=width, depth=depth, n_nodes=n_nodes,
        dtype="bfloat16", tree_dtype="bfloat16",
        # batched multi-leaf search in triangular grow mode with the padded
        # Pallas walk and the prefix backup — the fastest PARITY-VALIDATED
        # chip config (scripts/measure_round5.py at 16k envs: 0.2218s per
        # 64-node search = 4.65M sims/s; K=16 measures 5.60M but failed the
        # equal-budget parity study, results/k_parity_k16, and stays off)
        leaves_per_pass=8 if n_nodes > 16 else 1,
        use_pallas=False if n_nodes > 16 else None,
        grow_passes=n_nodes > 16,
    )
    model = build_model(cfg)
    world = hex.Hex.initial(n_envs, boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)
    mcfg = cfg.mcts_config()

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    @jax.jit
    def actor_step(world, key):
        k_search, k_act = jax.random.split(key)
        r = root(mcts(world, eval_fn, k_search, mcfg))
        actions = jax.random.categorical(k_act, r["logits"], axis=-1)
        new_world, _ = world.step(actions)
        # scalar fence: a host fetch of this is the only true sync on the
        # axon backend (block_until_ready returns early — see bench_env_steps)
        return new_world, r["v"].sum()

    key = jax.random.PRNGKey(0)
    world, fence = actor_step(world, key)  # compile + warm
    float(fence)

    best_dt = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        world, fence = actor_step(world, jax.random.fold_in(key, i))
        float(fence)
        best_dt = min(best_dt, time.perf_counter() - t0)
    return n_envs * (n_nodes - 1) / best_dt, n_envs / best_dt


def _wait_for_backend(budget_s=480):
    """The axon tunnel can report UNAVAILABLE for a while after an aborted
    chip job; poll a trivial program before giving up (CLAUDE.md gotchas)."""
    deadline = time.time() + budget_s
    while True:
        try:
            jax.jit(lambda a: a + 1)(jnp.zeros(8)).block_until_ready()
            return
        except Exception as e:
            if time.time() > deadline:
                raise
            print(f"# backend unavailable ({type(e).__name__}); retrying...",
                  file=sys.stderr, flush=True)
            time.sleep(30)


def main():
    _wait_for_backend()
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        env_envs, mcts_envs = 32 * 1024, 16 * 1024
        boardsize, width, depth, n_nodes = 9, 512, 4, 64
        env_reps, mcts_reps = 6, 4
    else:  # CPU smoke sizes
        env_envs, mcts_envs = 256, 64
        boardsize, width, depth, n_nodes = 9, 64, 2, 16
        env_reps, mcts_reps = 4, 3

    env_rate = bench_env_steps(env_envs, boardsize, reps=env_reps)
    sims_rate, sample_rate = bench_mcts(
        mcts_envs, boardsize, width, depth, n_nodes, reps=mcts_reps)

    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_9x9_per_chip",
                "value": round(env_rate, 1),
                "unit": "env-steps/s",
                # single-chip fraction of the driver's 10M/s multi-host
                # AGGREGATE target (BASELINE.md) — multiply by chips x
                # scaling efficiency (output/scaling_efficiency.json) for
                # the aggregate estimate
                "vs_baseline": round(env_rate / 10e6, 4),
                "baseline": "10M env-steps/s multi-host aggregate; this run is 1 chip",
                "n_chips": 1,
                "mcts_sims_per_s": round(sims_rate, 1),
                "mcts_sample_per_s": round(sample_rate, 1),
                "n_envs": env_envs,
                # the MCTS numbers are measured at the STATUS.md headline
                # config's env count (16k), not the env-bench's 32k — record
                # it so the two metrics can't be conflated (r4 VERDICT #8)
                "mcts_n_envs": mcts_envs,
                "timing": f"best-of-{env_reps} (env), best-of-{mcts_reps} (mcts)",
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
