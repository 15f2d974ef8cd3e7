"""Second-stage micro-benchmarks: why is the 512x4 net at 7% MXU, and how
fast is the optimized hex step? Pure-matmul chain vs the full net at two
batch sizes, plus flood ablation."""
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
    print(f"{name:16s} {best*1e3:9.3f} ms/step", flush=True)
    return best * 1e3


def main():
    B = 16 * 1024
    r = {}
    key = jax.random.PRNGKey(0)

    # pure bf16 matmul chain, 6 layers of 512x512 (the net's tower shape)
    Ws = [jax.random.normal(jax.random.PRNGKey(i), (512, 512), jnp.bfloat16) * 0.02
          for i in range(6)]
    x0 = jax.random.normal(jax.random.PRNGKey(9), (B, 512), jnp.bfloat16)

    @jax.jit
    def t_chain(x0, key):
        def body(c, k):
            x = x0
            for W in Ws:
                x = jax.nn.relu(x @ W)
            return c + x.sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    r["chain-16k"] = timed("chain-16k", t_chain, x0, key)

    x1 = jax.random.normal(jax.random.PRNGKey(9), (4 * B, 512), jnp.bfloat16)

    @jax.jit
    def t_chain4(x1, key):
        def body(c, k):
            x = x1
            for W in Ws:
                x = jax.nn.relu(x @ W)
            return c + x.sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    r["chain-64k"] = timed("chain-64k", t_chain4, x1, key)

    # the full net at 16k and 64k
    cfg = TrainConfig(boardsize=9, width=512, depth=4, dtype="bfloat16")
    model = build_model(cfg)
    for n in (B, 4 * B):
        world = hex.Hex.initial(n, 9)
        params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)
        obs, valid, seats = world.obs, world.valid, world.seats

        @jax.jit
        def t_net(obs, valid, seats, key):
            def body(c, k):
                d = model.apply(params, obs, valid, seats)
                return c + d["v"].sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
            return c

        r[f"net-{n//1024}k"] = timed(f"net-{n//1024}k", t_net, obs, valid, seats, key)

    # optimized env step (fresh board: no flood work) vs mid-game boards
    world = hex.Hex.initial(B, 9)

    @jax.jit
    def t_step(world, key):
        def body(wd, k):
            logits = jnp.where(wd.valid, 0.0, -jnp.inf)
            a = jax.random.categorical(k, logits, axis=-1)
            wd, _ = wd.step(a)
            return wd, None
        wd, _ = jax.lax.scan(body, world, jax.random.split(key, CHUNK))
        return wd.board

    r["env-step"] = timed("env-step", t_step, world, key)

    # mid-game: play 30 random plies first, then measure
    @jax.jit
    def warm(world, key):
        def body(wd, k):
            logits = jnp.where(wd.valid, 0.0, -jnp.inf)
            a = jax.random.categorical(k, logits, axis=-1)
            wd, _ = wd.step(a)
            return wd, None
        wd, _ = jax.lax.scan(body, world, jax.random.split(key, 30))
        return wd

    wmid = warm(world, jax.random.PRNGKey(7))
    r["env-step-mid"] = timed("env-step-mid", t_step, wmid, key)

    print(json.dumps({"n_envs": B, "ms": r}), flush=True)


if __name__ == "__main__":
    main()
