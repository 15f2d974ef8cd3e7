"""Sampler-stage shootout at flagship shapes: XLA _sample_children_multi vs
the sampler-only Pallas kernel at several block sizes. (The solve stays XLA
in both; probs are precomputed once outside the timed region.)"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search, pallas_kernels
from boardlaw_tpu.train import TrainConfig, build_model

B, K = 16 * 1024, 8
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
    print(f"{name:28s} {min(times)*1e3:9.3f} ms", flush=True)
    return out


def main():
    cfg = TrainConfig(boardsize=9, width=512, depth=4, n_nodes=64,
                      dtype="bfloat16", tree_dtype="bfloat16", use_pallas=False,
                      leaves_per_pass=K)
    mcfg = cfg.mcts_config()
    model = build_model(cfg)
    world = hex.Hex.initial(B, cfg.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    @jax.jit
    def build_tree(world, key):
        k_init, k_sims = jax.random.split(key)
        tree = search.build(world, mcfg)
        tree = search.initialize(tree, eval_fn(world, None), k_init, mcfg, world.valid)

        def body(tree, k):
            return search.simulate_multi(tree, eval_fn, k, mcfg), None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(k_sims, 3))
        return tree

    tree = build_tree(world, jax.random.PRNGKey(1))
    jax.block_until_ready(tree.n)
    print("tree built", flush=True)

    T = tree.terminal.shape[-1]
    probs = jax.jit(lambda t: search.node_probs(t, search._q_bounds(t)))(tree)
    jax.block_until_ready(probs)
    rands_kbt = jax.random.uniform(jax.random.PRNGKey(7), (K, B, T))
    rands_bkt = jnp.moveaxis(rands_kbt, 0, 1)

    @jax.jit
    def xla_sample(tree, probs, rands):
        return search._sample_children_multi(tree, probs, rands)

    a = timed("xla sampler", xla_sample, tree, probs, rands_kbt)

    def pallas_sample(block):
        @jax.jit
        def f(tree, probs, rands):
            return pallas_kernels.sample_children_multi(
                probs, tree.children, rands, block_envs=block)
        return f

    for block in (64, 256):
        try:
            c = timed(f"pallas sampler block={block}", pallas_sample(block),
                      tree, probs, rands_bkt)
            match = float(jnp.mean((jnp.moveaxis(c[0], 1, 0) == a[0]).astype(jnp.float32)))
            print(f"  action match vs xla: {match:.4f}", flush=True)
        except Exception as e:
            print(f"pallas block={block} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
