"""Micro-bench: (a) solve-iteration formulations — separate s/g/h reductions
(current) vs a single stacked 3-moment reduction per iteration; (b) multi-
sampler count extraction — per-k Python loop (current) vs one stacked
compare+reduce over all K draws. Flagship shapes: 16k envs, T=65, A=81, K=8."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, T, A, K = 16 * 1024, 65, 81, 8
REPS = 5


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(json.dumps({"name": name, "ms": round(min(times) * 1e3, 3)}), flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lampi = jax.random.uniform(k1, (B * T, A)) * 0.1
    q = jax.random.uniform(k2, (B * T, A))
    alpha = q.max(-1) + 0.05
    probs = jax.random.uniform(k3, (B, T, A))
    rands = jax.random.uniform(k4, (K, B, T))

    # --- (a) one Halley iteration's reductions ---
    @jax.jit
    def iter_current(lampi, q, alpha):
        r = 1.0 / (alpha[:, None] - q)
        terms = lampi * r
        s = terms.sum(-1)
        g = -(terms * r).sum(-1)
        h = 2.0 * (terms * r * r).sum(-1)
        err = s - 1.0
        t = err * h / (2.0 * g * g)
        step = err / g
        ok = (err > 0) & (t < 0.75)
        step = jnp.where(ok, step / jnp.maximum(1.0 - t, 0.25), step)
        return alpha - step

    @jax.jit
    def iter_stacked(lampi, q, alpha):
        r = 1.0 / (alpha[:, None] - q)
        terms = lampi * r
        # one multi-moment reduction: stack (1, r, r^2) on a new axis so XLA
        # reads lampi/q once and emits all three sums from one loop
        m = (terms[:, :, None] * jnp.stack(
            [jnp.ones_like(r), r, r * r], -1)).sum(1)  # (BT, 3): s, -g, h/2
        s = m[:, 0]
        g = -m[:, 1]
        h = 2.0 * m[:, 2]
        err = s - 1.0
        t = err * h / (2.0 * g * g)
        step = err / g
        ok = (err > 0) & (t < 0.75)
        step = jnp.where(ok, step / jnp.maximum(1.0 - t, 0.25), step)
        return alpha - step

    @jax.jit
    def iter_dot(lampi, q, alpha):
        # moments as one matmul against a (A, 3) iota-power matrix can't
        # express r-dependence; instead fuse via polynomial in r built once
        r = 1.0 / (alpha[:, None] - q)
        t1 = lampi * r
        t2 = t1 * r
        t3 = t2 * r
        cat = jnp.concatenate([t1, t2, t3], axis=-1)  # (BT, 3A) one write
        m = cat.reshape(-1, 3, A).sum(-1)  # hmm reshape reorders; check cost
        return alpha - m[:, 0]

    timed("halley iter: separate s/g/h reduces (current)", iter_current, lampi, q, alpha)
    timed("halley iter: stacked 3-moment reduce", iter_stacked, lampi, q, alpha)
    timed("halley iter: concat+reshape reduce", iter_dot, lampi, q, alpha)

    # --- (b) sampler count extraction ---
    lane = jnp.arange(A)
    incl = (lane[:, None] <= lane[None, :]).astype(jnp.float32)

    @jax.jit
    def sample_loop(probs, rands):
        cum = jnp.matmul(probs, incl, precision=jax.lax.Precision.HIGHEST)
        outs = []
        for k in range(K):
            outs.append(jnp.sum(cum < rands[k][:, :, None], -1).astype(jnp.int32))
        return jnp.stack(outs)

    @jax.jit
    def sample_stacked(probs, rands):
        cum = jnp.matmul(probs, incl, precision=jax.lax.Precision.HIGHEST)
        # (B,T,A) vs (K,B,T): broadcast compare, reduce A -> (K,B,T)
        return jnp.sum(cum[None] < rands[..., None], -1).astype(jnp.int32)

    @jax.jit
    def sample_kl(probs, rands):
        cum = jnp.matmul(probs, incl, precision=jax.lax.Precision.HIGHEST)
        # K on the last (lane) axis of the OUTPUT: (B,T,K)
        r_btk = jnp.moveaxis(rands, 0, -1)  # (B,T,K)
        return jnp.sum(cum[:, :, :, None] < r_btk[:, :, None, :], -2).astype(jnp.int32)

    a = timed("sample: per-k loop (current)", sample_loop, probs, rands)
    b = timed("sample: stacked (K,B,T) reduce", sample_stacked, probs, rands)
    c = timed("sample: (B,T,K) lane-out reduce", sample_kl, probs, rands)
    print(json.dumps({"name": "agreement", "loop_vs_stacked": bool((a == b).all()),
                      "loop_vs_kl": bool((a == jnp.moveaxis(c, -1, 0)).all())}),
          flush=True)


if __name__ == "__main__":
    main()
