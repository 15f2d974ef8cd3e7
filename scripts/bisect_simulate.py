"""Bisect the MCTS simulate step's cost on the real chip.

The phase profile (scripts/profile_mcts.py) showed `simulate` costing far
more than the sum of its parts — the component tests used CONSTANT scatter
indices, which XLA strength-reduces to dynamic-update-slices, while the real
step scatters at per-env VARYING rows. This harness times simulate variants
with individual pieces knocked out, plus head-to-head row-gather/scatter
formulations, to attribute the real cost.

Usage: python scripts/bisect_simulate.py [n_envs]
"""
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
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        times.append((time.perf_counter() - t0) / CHUNK)
    best = min(times)
    print(f"{name:24s} {best*1e3:9.2f} ms/step", flush=True)
    return best


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024
    cfg = TrainConfig(
        boardsize=9, width=512, depth=4, n_nodes=64,
        dtype="bfloat16", tree_dtype="bfloat16",
    )
    mcfg = cfg.mcts_config()
    model = build_model(cfg)
    world = hex.Hex.initial(n_envs, cfg.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    print(f"n_envs={n_envs} platform={jax.devices()[0].platform}", flush=True)

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

    tree = build_tree(world, jax.random.PRNGKey(1))
    jax.block_until_ready(tree.n)
    print("tree built", flush=True)
    key = jax.random.PRNGKey(2)
    B, T, A = tree.children.shape
    envs = jnp.arange(B)

    # -- simulate variants --------------------------------------------------
    def simulate_variant(tree, k, *, expand=True, backup=True, env=True,
                         eval_net=True, walk=True):
        k_rand, k_eval, k_aux = jax.random.split(k, 3)
        rands = jax.random.uniform(k_rand, (B, T))
        acts, nxt = search._node_actions_any(tree, rands, mcfg)
        if walk:
            halt = search._halt_of(tree, nxt)
            parents, actions, existing, path = search._walk(
                acts, nxt, halt, tree.terminal[:, 0]
            )
        else:
            parents = jax.random.randint(k_aux, (B,), 0, 24)
            actions = acts[:, 0]
            existing = jnp.full((B,), -1, jnp.int32)
            path = jnp.where(
                jnp.arange(T)[None, :] == 0, parents[:, None], -1
            )
        leaves = jnp.where(existing == -1, tree.sim, existing).astype(jnp.int32)

        if env:
            old_world = jax.tree.map(
                lambda x: search._take_node(x, parents, dtype=x.dtype), tree.worlds
            )
            world, transition = old_world.step(actions)
        else:
            world = jax.tree.map(lambda x: x[:, 0], tree.worlds)
            transition = type("T", (), {})()
            transition.terminal = jnp.zeros((B,), bool)
            transition.rewards = jnp.zeros((B, 2), jnp.float32)

        if eval_net:
            decisions = eval_fn(world, k_eval)
        else:
            decisions = {
                "logits": jnp.zeros((B, A), jnp.float32),
                "v": jnp.zeros((B, 2), jnp.float32),
            }

        if expand:
            iota_t = jnp.arange(T)[None, :]
            oh_leaf = iota_t == leaves[:, None]
            oh_parent = iota_t == parents[:, None]
            oh_act = jnp.arange(A)[None, :] == actions[:, None]

            def set_row(full, new, oh=oh_leaf):
                mask = oh.reshape(oh.shape + (1,) * (full.ndim - 2))
                return jnp.where(mask, new[:, None].astype(full.dtype), full)

            tree = tree.replace(
                children=jnp.where(
                    oh_parent[:, :, None] & oh_act[:, None, :],
                    leaves[:, None, None].astype(tree.children.dtype),
                    tree.children),
                parents=set_row(tree.parents, parents),
                relation=set_row(tree.relation, actions),
                worlds=jax.tree.map(lambda full, new: set_row(full, new),
                                    tree.worlds, world),
                seats=set_row(tree.seats, world.seats.astype(jnp.int32)),
                terminal=set_row(tree.terminal, transition.terminal),
                rewards=set_row(tree.rewards, transition.rewards),
                logits=set_row(tree.logits, search._clamp_logits(decisions["logits"])),
                v=set_row(tree.v, decisions["v"]),
                sim=tree.sim + 1,
            )

        if backup:
            tree = search.backup_path(tree, path, acts, leaves, 2)
        return tree

    def scan_over(fn):
        @jax.jit
        def run(tree, key):
            def body(tree, k):
                return fn(tree, k), None

            tree, _ = jax.lax.scan(body, tree, jax.random.split(key, CHUNK))
            return tree.n

        return run

    import functools

    results = {}
    results["full"] = timed("full", scan_over(simulate_variant), tree, key)
    results["no-backup"] = timed(
        "no-backup", scan_over(functools.partial(simulate_variant, backup=False)), tree, key)
    results["no-expand"] = timed(
        "no-expand", scan_over(functools.partial(simulate_variant, expand=False)), tree, key)
    results["no-env"] = timed(
        "no-env", scan_over(functools.partial(simulate_variant, env=False)), tree, key)
    results["no-eval"] = timed(
        "no-eval", scan_over(functools.partial(simulate_variant, eval_net=False)), tree, key)
    results["no-walk"] = timed(
        "no-walk", scan_over(functools.partial(simulate_variant, walk=False)), tree, key)
    results["nodes-only"] = timed(
        "nodes-only",
        scan_over(functools.partial(
            simulate_variant, walk=False, env=False, eval_net=False,
            expand=False, backup=False)),
        tree, key)

    # -- row gather formulations -------------------------------------------
    @jax.jit
    def g_take(tree, key):
        def body(c, k):
            t = jax.random.randint(k, (B,), 0, 24)
            row = search._take_node(tree.logits, t)
            return c + row.astype(jnp.float32).sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    @jax.jit
    def g_matmul(tree, key):
        def body(c, k):
            t = jax.random.randint(k, (B,), 0, 24)
            onehot = jax.nn.one_hot(t, T, dtype=jnp.bfloat16)
            row = jnp.einsum(
                "bta,bt->ba", tree.logits.astype(jnp.bfloat16), onehot,
                preferred_element_type=jnp.float32)
            return c + row.sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, CHUNK))
        return c

    # -- row scatter formulations ------------------------------------------
    new_row = jnp.ones((B, A), jnp.bfloat16)

    @jax.jit
    def s_at(tree, key):
        def body(logits, k):
            t = jax.random.randint(k, (B,), 0, 24)
            return logits.at[envs, t].set(new_row.astype(logits.dtype)), None

        logits, _ = jax.lax.scan(body, tree.logits, jax.random.split(key, CHUNK))
        return logits

    @jax.jit
    def s_blend(tree, key):
        def body(logits, k):
            t = jax.random.randint(k, (B,), 0, 24)
            onehot = (jnp.arange(T)[None, :] == t[:, None])[..., None]  # (B,T,1)
            return jnp.where(onehot, new_row[:, None, :].astype(logits.dtype), logits), None

        logits, _ = jax.lax.scan(body, tree.logits, jax.random.split(key, CHUNK))
        return logits

    # -- edge-delta application formulations -------------------------------
    dn = jax.random.uniform(key, (B, T))
    dwp = jax.random.uniform(key, (B, T))

    @jax.jit
    def e_scatter(tree, dn, dwp, key):
        def body(carry, k):
            ne, we = carry
            has_edge = tree.parents >= 0
            safe_p = jnp.clip(tree.parents, 0)
            safe_r = jnp.clip(tree.relation, 0)
            b_idx = jnp.broadcast_to(envs[:, None], (B, T))
            ne = ne.at[b_idx, safe_p, safe_r].add(
                jnp.where(has_edge, dn, 0.0).astype(ne.dtype))
            we = we.at[b_idx, safe_p, safe_r].add(
                jnp.where(has_edge, dwp, 0.0).astype(we.dtype))
            return (ne, we), None

        (ne, we), _ = jax.lax.scan(
            body, (tree.n_edge, tree.w_edge), jax.random.split(key, CHUNK))
        return ne

    @jax.jit
    def e_matmul(tree, dn, dwp, key):
        def body(carry, k):
            ne, we = carry
            has_edge = tree.parents >= 0
            safe_p = jnp.clip(tree.parents, 0)
            safe_r = jnp.clip(tree.relation, 0)
            oh_p = jax.nn.one_hot(safe_p, T, dtype=jnp.bfloat16)  # (B,T,P)
            oh_r = jax.nn.one_hot(safe_r, A, dtype=jnp.bfloat16)  # (B,T,A)
            dnm = jnp.where(has_edge, dn, 0.0).astype(jnp.bfloat16)
            dwm = jnp.where(has_edge, dwp, 0.0).astype(jnp.bfloat16)
            d_ne = jnp.einsum("btp,bta->bpa", oh_p, oh_r * dnm[..., None],
                              preferred_element_type=jnp.float32)
            d_we = jnp.einsum("btp,bta->bpa", oh_p, oh_r * dwm[..., None],
                              preferred_element_type=jnp.float32)
            return (ne + d_ne.astype(ne.dtype), we + d_we.astype(we.dtype)), None

        (ne, we), _ = jax.lax.scan(
            body, (tree.n_edge, tree.w_edge), jax.random.split(key, CHUNK))
        return ne

    results["gather-take"] = timed("gather-take", g_take, tree, key)
    results["gather-matmul"] = timed("gather-matmul", g_matmul, tree, key)
    results["scatter-at"] = timed("scatter-at", s_at, tree, key)
    results["scatter-blend"] = timed("scatter-blend", s_blend, tree, key)
    results["edges-scatter"] = timed("edges-scatter", e_scatter, tree, dn, dwp, key)
    results["edges-matmul"] = timed("edges-matmul", e_matmul, tree, dn, dwp, key)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
