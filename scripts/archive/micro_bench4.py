"""Isolate the ~3ms/iteration fixed cost: carry size vs matmul presence vs
dtype vs program count."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CHUNK = 8
REPS = 5
B = 16 * 1024


def timed(name, fn, *args, div=CHUNK):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / div)
    best = min(times)
    print(f"{name:20s} {best*1e3:9.3f} ms/step", flush=True)
    return best * 1e3


def main():
    r = {}
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(jax.random.PRNGKey(1), (512, 512), jnp.bfloat16) * 0.05
    Wf = W.astype(jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(9), (B, 512), jnp.bfloat16)
    x0f = x0.astype(jnp.float32)

    # a) 16MB carry, trivial elementwise body
    @jax.jit
    def t_carry_triv(x, key):
        def body(x, k):
            return x * 1.0001, None
        x, _ = jax.lax.scan(body, x, jax.random.split(key, CHUNK))
        return x
    r["carry16MB-trivial"] = timed("carry16MB-trivial", t_carry_triv, x0, key)

    # c) scalar carry, matmul intermediate reduced to scalar
    @jax.jit
    def t_scalar_mm(x, key):
        def body(c, k):
            return c + jax.nn.relu(x @ W).sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c
    r["scalarcarry-mm"] = timed("scalarcarry-mm", t_scalar_mm, x0, key)

    # d) mm over scan xs input (fresh x each iter, no carry dependence)
    xs = jnp.stack([x0] * CHUNK)

    @jax.jit
    def t_xs_mm(xs, key):
        def body(c, x):
            return c + jax.nn.relu(x @ W).sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c
    r["xs-mm"] = timed("xs-mm", t_xs_mm, xs, key)

    # e) f32 matmul carry chain
    @jax.jit
    def t_mm_f32(x, key):
        def body(x, k):
            return jax.nn.relu(x @ Wf), None
        x, _ = jax.lax.scan(body, x, jax.random.split(key, CHUNK))
        return x
    r["mm1-f32-carry"] = timed("mm1-f32-carry", t_mm_f32, x0f, key)

    # f) bf16 matmul carry chain (mm1 baseline repeat)
    @jax.jit
    def t_mm_bf16(x, key):
        def body(x, k):
            return jax.nn.relu(x @ W), None
        x, _ = jax.lax.scan(body, x, jax.random.split(key, CHUNK))
        return x
    r["mm1-bf16-carry"] = timed("mm1-bf16-carry", t_mm_bf16, x0, key)

    # g) single program, one matmul, timed alone (program-dispatch floor)
    @jax.jit
    def t_one(x):
        return jax.nn.relu(x @ W)
    r["one-mm-program"] = timed("one-mm-program", t_one, x0, div=1)

    # h) trivial program dispatch floor
    @jax.jit
    def t_nop(x):
        return x * 1.0001
    r["one-ew-program"] = timed("one-ew-program", t_nop, x0, div=1)

    # i) carry chain of matmul but SMALL carry (512x512)
    y0 = jax.random.normal(jax.random.PRNGKey(4), (512, 512), jnp.bfloat16)

    @jax.jit
    def t_small(y, key):
        def body(y, k):
            return jax.nn.relu(y @ W), None
        y, _ = jax.lax.scan(body, y, jax.random.split(key, CHUNK))
        return y
    r["mm1-smallcarry"] = timed("mm1-smallcarry", t_small, y0, key)

    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
