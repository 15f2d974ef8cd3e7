"""Establish the per-kernel launch overhead hypothesis: time scans whose
bodies chain 1, 3, 6, 12 matmuls (carry-dependent, so nothing hoists), at two
batch sizes. If time scales with matmul COUNT not FLOPs, launches dominate."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CHUNK = 8
REPS = 5


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / CHUNK)
    best = min(times)
    print(f"{name:16s} {best*1e3:9.3f} ms/step", flush=True)
    return best * 1e3


def chain_fn(n_mm, B):
    Ws = [jax.random.normal(jax.random.PRNGKey(i), (512, 512), jnp.bfloat16) * 0.05
          for i in range(n_mm)]

    @jax.jit
    def f(x, key):
        def body(x, k):
            for W in Ws:
                x = jax.nn.relu(x @ W)
            return x, None
        x, _ = jax.lax.scan(body, x, jax.random.split(key, CHUNK))
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(9), (B, 512), jnp.bfloat16)
    return f, x0


def main():
    r = {}
    key = jax.random.PRNGKey(0)
    for B in (16 * 1024, 64 * 1024):
        for n_mm in (1, 3, 6, 12):
            f, x0 = chain_fn(n_mm, B)
            r[f"mm{n_mm}-{B//1024}k"] = timed(f"mm{n_mm}-{B//1024}k", f, x0, key)

    # single fused elementwise kernel on a big tensor, carry-chained:
    # measures launch floor for 1 kernel/iter with real data dependence
    big = jax.random.normal(jax.random.PRNGKey(3), (16 * 1024, 64, 81), jnp.float32)

    @jax.jit
    def f_ew(x, key):
        def body(x, k):
            return jnp.tanh(x) * 1.0001 + 0.001, None

        x, _ = jax.lax.scan(body, x, jax.random.split(key, CHUNK))
        return x

    r["elemwise-85MB"] = timed("elemwise-85MB", f_ew, big, key)

    # no-scan variant: one jit call = CHUNK sequential 6-matmul chains
    f6, x0 = chain_fn(6, 16 * 1024)

    @jax.jit
    def f_flat(x):
        Ws = [jax.random.normal(jax.random.PRNGKey(i), (512, 512), jnp.bfloat16) * 0.05
              for i in range(6)]
        for _ in range(CHUNK):
            for W in Ws:
                x = jax.nn.relu(x @ W)
        return x

    r["mm6-16k-unrolled"] = timed("mm6-16k-unroll", f_flat, x0)

    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
