"""Ablation profile of the MCTS simulate step on the real chip.

Times each component of `mcts.search.simulate` in isolation on a realistic
mid-search tree (9x9, 512x4 bf16 net, 16k envs by default):

    descend   — the Pallas descend kernel
    backup    — the Pallas dense backup kernel
    expand    — the XLA expansion scatters (children/parents/worlds/logits/v)
    env-step  — the leaf world step (flood fill)
    eval      — the network eval
    qbounds   — the global q min-max
    simulate  — the whole fused step
    actor     — a full 64-node search + act (the train-loop actor)

Each timing jits a `lax.scan` of CHUNK repetitions (host loop between chunks;
a single fused chain of 64 full searches faults this runtime — CLAUDE.md).

Usage: python scripts/profile_mcts.py [n_envs] [--xla] (force XLA kernels)
"""
import dataclasses
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search
from boardlaw_tpu.train import TrainConfig, build_model

CHUNK = 8
REPS = 3


def timed(name, fn, *args):
    """fn must be jitted and return something device-resident."""
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        times.append((time.perf_counter() - t0) / CHUNK)
    best = min(times)
    print(f"{name:10s} {best*1e3:9.2f} ms/step")
    return best


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16 * 1024
    use_pallas = "--xla" not in sys.argv

    cfg = TrainConfig(
        boardsize=9, width=512, depth=4, n_nodes=64,
        dtype="bfloat16", tree_dtype="bfloat16", use_pallas=use_pallas,
    )
    mcfg = cfg.mcts_config()
    model = build_model(cfg)
    world = hex.Hex.initial(n_envs, cfg.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    print(f"n_envs={n_envs} boardsize={cfg.boardsize} net=512x4 "
          f"n_nodes={cfg.n_nodes} pallas={use_pallas} "
          f"platform={jax.devices()[0].platform}", flush=True)

    # -- build a realistic mid-search tree: run 48 sims ----------------------
    @jax.jit
    def build_tree(world, key):
        k_init, k_sims = jax.random.split(key)
        tree = search.build(world, mcfg)
        tree = search.initialize(tree, eval_fn(world, None), k_init, mcfg, world.valid)

        def body(tree, k):
            return search.simulate(tree, eval_fn, k, mcfg), None

        keys = jax.random.split(k_sims, 24)
        tree, _ = jax.lax.scan(body, tree, keys)
        return tree

    t0 = time.perf_counter()
    tree = build_tree(world, jax.random.PRNGKey(1))
    tree = build_tree(world, jax.random.PRNGKey(1))  # post-mid-state again
    jax.block_until_ready(tree.n)
    print(f"tree built (24 sims warm) {time.perf_counter()-t0:.1f}s", flush=True)

    key = jax.random.PRNGKey(2)

    # -- components ----------------------------------------------------------
    from boardlaw_tpu.mcts import pallas_kernels

    @jax.jit
    def t_descend(tree, key):
        def body(c, k):
            rands = jax.random.uniform(k, tree.parents.shape)
            if use_pallas:
                p, a = pallas_kernels.descend(tree, rands, block_envs=mcfg.pallas_block_envs)
            else:
                p, a = search.descend(tree, rands, mcfg)
            return c + p.sum() + a.sum(), None

        c, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_nodes(tree, key):
        # the all-node solve/sample alone (Pallas kernel when enabled)
        qb = search._q_bounds(tree)

        def body(c, k):
            rands = jax.random.uniform(k, tree.parents.shape)
            if search._pallas_nodes_enabled(mcfg, tree.parents.shape[0]):
                a, ch = pallas_kernels.node_actions(
                    tree, rands, qb, block_envs=mcfg.pallas_nodes_envs)
            else:
                a, ch = search.node_actions(tree, rands, qb)
            return c + a.sum() + ch.sum(), None

        c, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_backup(tree, key):
        def body(tree, k):
            leaves = jax.random.randint(k, (tree.n.shape[0],), 0, 24)
            if use_pallas:
                tree = pallas_kernels.backup_dense(tree, leaves, 2, block_envs=mcfg.pallas_backup_envs)
            else:
                tree = search.backup(tree, leaves, 2)
            return tree, None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(key, CHUNK))
        return tree.n

    @jax.jit
    def t_expand(tree, key):
        B = tree.parents.shape[0]
        envs = jnp.arange(B)

        def body(tree, k):
            k1, k2, k_eval = jax.random.split(k, 3)
            parents = jax.random.randint(k1, (B,), 0, 24)
            actions = jax.random.randint(k2, (B,), 0, tree.children.shape[-1])
            leaves = jnp.full((B,), 30, jnp.int32)
            old_world = jax.tree.map(lambda x: search._take_node(x, parents, dtype=x.dtype), tree.worlds)
            world, transition = old_world.step(actions)
            decisions = eval_fn(world, k_eval)
            tree = tree.replace(
                children=tree.children.at[envs, parents, actions].set(
                    leaves.astype(tree.children.dtype)),
                parents=tree.parents.at[envs, leaves].set(parents),
                relation=tree.relation.at[envs, leaves].set(actions),
                worlds=jax.tree.map(lambda full, new: full.at[envs, leaves].set(new), tree.worlds, world),
                seats=tree.seats.at[envs, leaves].set(world.seats.astype(jnp.int32)),
                terminal=tree.terminal.at[envs, leaves].set(transition.terminal),
                rewards=tree.rewards.at[envs, leaves].set(transition.rewards.astype(tree.rewards.dtype)),
                logits=tree.logits.at[envs, leaves].set(
                    search._clamp_logits(decisions["logits"]).astype(tree.logits.dtype)),
                v=tree.v.at[envs, leaves].set(decisions["v"].astype(tree.v.dtype)),
            )
            return tree, None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(key, CHUNK))
        return tree.n

    @jax.jit
    def t_eval(world, key):
        def body(c, k):
            d = eval_fn(world, k)
            return c + d["v"].sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_envstep(world, key):
        def body(w, k):
            logits = jnp.where(w.valid, 0.0, -jnp.inf)
            a = jax.random.categorical(k, logits, axis=-1)
            w, _ = w.step(a)
            return w, None

        w, _ = jax.lax.scan(body, world, jax.random.split(key, CHUNK))
        return w.board

    @jax.jit
    def t_qbounds(tree, key):
        def body(c, k):
            lo, hi = search._q_bounds(tree)
            return c + lo + hi, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def t_simulate(tree, key):
        def body(tree, k):
            return search.simulate(tree, eval_fn, k, mcfg), None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(key, CHUNK))
        return tree.n

    # Batched multi-leaf pass: K leaves per pass, CHUNK passes chained.
    # NOTE the host-sync quantum of this runtime (~32ms per jitted call,
    # scripts/archive/micro_bench4.py): component timings at CHUNK=8 carry a ~4ms/step
    # inflation; only multi-ms numbers are trustworthy.
    K = 8
    mcfg_multi = dataclasses.replace(mcfg, leaves_per_pass=K, use_pallas=False)

    @jax.jit
    def t_multi(tree, key):
        def body(tree, k):
            return search.simulate_multi(tree, eval_fn, k, mcfg_multi), None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(key, CHUNK))
        return tree.n

    # tree built with the multi capacity (T = 1 + K*ceil((n_nodes-1)/K))
    @jax.jit
    def build_tree_multi(world, key):
        k_init, k_sims = jax.random.split(key)
        tree = search.build(world, mcfg_multi)
        tree = search.initialize(tree, eval_fn(world, None), k_init, mcfg_multi, world.valid)

        def body(tree, k):
            return search.simulate_multi(tree, eval_fn, k, mcfg_multi), None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(k_sims, 3))
        return tree

    results = {}
    results["qbounds"] = timed("qbounds", t_qbounds, tree, key)
    results["eval"] = timed("eval", t_eval, world, key)
    results["env-step"] = timed("env-step", t_envstep, world, key)
    results["nodes"] = timed("nodes", t_nodes, tree, key)
    results["descend"] = timed("descend", t_descend, tree, key)
    results["backup"] = timed("backup", t_backup, tree, key)
    results["expand"] = timed("expand", t_expand, tree, key)
    results["simulate"] = timed("simulate", t_simulate, tree, key)

    tree_m = build_tree_multi(world, jax.random.PRNGKey(1))
    jax.block_until_ready(tree_m.n)
    results["multi-pass"] = timed("multi-pass", t_multi, tree_m, key)

    sims_per_s = n_envs / results["simulate"]
    multi_sims_per_s = K * n_envs / results["multi-pass"]
    print(json.dumps({"n_envs": n_envs, "pallas": use_pallas, "K": K,
                      "ms": {k: round(v * 1e3, 2) for k, v in results.items()},
                      "sims_per_s": round(sims_per_s),
                      "multi_sims_per_s": round(multi_sims_per_s)}))


if __name__ == "__main__":
    main()
