"""Micro-benchmarks for the suspect hot ops on the real chip: the global
q-bounds reduction, Hex observe, the raw net forward, and the env step.
Each timing is a jitted scan of CHUNK reps, min over REPS trials."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.train import TrainConfig, build_model

CHUNK = 8
REPS = 3


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        times.append((time.perf_counter() - t0) / CHUNK)
    best = min(times)
    print(f"{name:12s} {best*1e3:9.3f} ms/step", flush=True)
    return best * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024
    cfg = TrainConfig(boardsize=9, width=512, depth=4, dtype="bfloat16")
    model = build_model(cfg)
    world = hex.Hex.initial(B, 9)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    w = jnp.zeros((B, 64, 2), jnp.float32)
    n = jnp.zeros((B, 64), jnp.float32)
    obs0 = world.obs
    valid0 = world.valid
    seats0 = world.seats

    r = {}

    @jax.jit
    def t_qbounds(w, n, key):
        def body(c, k):
            q = w / (n[..., None] + 1e-4)
            return c + q.min() + q.max(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_obs(world, key):
        def body(c, k):
            return c + world.obs.sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_net(obs, valid, seats, key):
        def body(c, k):
            d = model.apply(params, obs, valid, seats)
            return c + d["v"].sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_valid(world, key):
        def body(c, k):
            return c + world.valid.sum(), None
        c, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_step(world, key):
        def body(wd, k):
            logits = jnp.where(wd.valid, 0.0, -jnp.inf)
            a = jax.random.categorical(k, logits, axis=-1)
            wd, _ = wd.step(a)
            return wd, None
        wd, _ = jax.lax.scan(body, world, jax.random.split(key, CHUNK))
        return wd.board

    key = jax.random.PRNGKey(0)
    r["qbounds"] = timed("qbounds", t_qbounds, w, n, key)
    r["obs"] = timed("obs", t_obs, world, key)
    r["valid"] = timed("valid", t_valid, world, key)
    r["net-raw"] = timed("net-raw", t_net, obs0, valid0, seats0, key)
    r["env-step"] = timed("env-step", t_step, world, key)
    print(json.dumps({"n_envs": B, "ms": r}), flush=True)


if __name__ == "__main__":
    main()
