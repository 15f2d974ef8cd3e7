"""Vectorized regularized-policy MCTS, tree-as-tensors, all under jit.

Reference counterpart: boardlaw/mcts/__init__.py (tree bookkeeping, agent) and
boardlaw/mcts/cpp/{cuda.cu,cpu.cpp} (descend/root/backup kernels + the
Newton-solved regularized policy of Grill et al. 2020).

TPU-first design. The reference's "one CUDA thread per env walks the tree"
becomes batched tensor walks: *all* envs descend/backup in lockstep under a
single `lax.while_loop` with per-env active masks, each step doing (B, A)
vector math on the VPU. The per-node action distribution

    pi_bar(a) = lambda_N * pi(a) / (alpha - q(a)),  alpha s.t. sum_a pi_bar = 1

is solved by a *vectorized* Newton iteration over all envs at once
(cuda.cu:35-68 solves it per-thread in shared memory). The whole search —
descend, env step, network eval, backup, over n_nodes simulations — is one
`lax.scan` inside one jit program: no host round-trips at all.

Known-bug policy: the reference's lambda_N calculation (README.md:9-11,
Issue #15) counts each backup visit once per *seat* (n += n_seats per node,
mcts/cpp/cuda.cu:224-231), inflating N in lambda_N = c_puct*N/(N+A). We keep
that behaviour by default for parity (`backup_n='seats'`); pass
`backup_n='visits'` for the fixed accounting.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
from flax import struct

from .. import utils


@dataclass(frozen=True)
class MCTSConfig:
    """Static search configuration (hashable -> usable as a jit static arg).

    c_puct high concentrates on the prior; low concentrates on value
    (reference mcts/__init__.py:29-33).
    """

    n_nodes: int = 64
    c_puct: float = 1 / 16
    noise_eps: float = 0.25
    alpha_scale: float = 10.0
    backup_n: str = "seats"  # 'seats' = reference behaviour, 'visits' = fixed
    tree_dtype: object = jnp.float32  # storage dtype for logits


class Tree(struct.PyTreeNode):
    """The search tree for every env, as dense (B, T, ...) tensors.

    Same data model as the reference (mcts/__init__.py:43-70): children /
    parents / relation topology, per-node worlds, transitions, decisions,
    and visit statistics, preallocated at T = n_nodes slots.
    """

    children: jnp.ndarray  # (B,T,A) int32, -1 = unexpanded
    parents: jnp.ndarray  # (B,T) int32, -1 = no parent
    relation: jnp.ndarray  # (B,T) int32, action that led here
    worlds: object  # world pytree with leaves (B,T,...)
    seats: jnp.ndarray  # (B,T) int32 seat-to-play per node
    terminal: jnp.ndarray  # (B,T) bool
    rewards: jnp.ndarray  # (B,T,S) f32
    logits: jnp.ndarray  # (B,T,A) tree_dtype log-prior per node
    v: jnp.ndarray  # (B,T,S) f32 network value per node
    n: jnp.ndarray  # (B,T) int32 visit counts
    w: jnp.ndarray  # (B,T,S) f32 value sums
    c_puct: jnp.ndarray  # (B,) f32
    sim: jnp.ndarray  # () int32 — next free node slot


def build(world, cfg: MCTSConfig):
    """Preallocate the tree with the root world in slot 0
    (reference mcts/__init__.py:29-70)."""
    B = world.n_envs
    T = cfg.n_nodes
    A = world.action_space.dim
    S = world.n_seats

    worlds = jax.tree.map(lambda x: jnp.broadcast_to(x[:, None], (B, T) + x.shape[1:]), world)
    return Tree(
        children=jnp.full((B, T, A), -1, jnp.int32),
        parents=jnp.full((B, T), -1, jnp.int32),
        relation=jnp.full((B, T), -1, jnp.int32),
        worlds=worlds,
        seats=jnp.broadcast_to(world.seats.astype(jnp.int32)[:, None], (B, T)),
        terminal=jnp.zeros((B, T), bool),
        rewards=jnp.zeros((B, T, S), jnp.float32),
        logits=jnp.full((B, T, A), jnp.nan, cfg.tree_dtype),
        v=jnp.full((B, T, S), jnp.nan, jnp.float32),
        n=jnp.zeros((B, T), jnp.int32),
        w=jnp.zeros((B, T, S), jnp.float32),
        c_puct=jnp.full((B,), cfg.c_puct, jnp.float32),
        sim=jnp.array(0, jnp.int32),
    )


def dirichlet_noise(key, logits, valid, eps, alpha_scale=10.0):
    """Mix a Dirichlet draw over the valid actions into the root prior
    (reference mcts/__init__.py:13-24)."""
    A = logits.shape[-1]
    alpha = jnp.full((A,), alpha_scale / A)
    draw = jax.random.dirichlet(key, alpha, shape=logits.shape[:-1])
    draw = jnp.where(valid, draw, 0.0)
    draw = draw / draw.sum(-1, keepdims=True)
    probs = jnp.exp(logits.astype(jnp.float32)) * (1 - eps) + draw * eps
    return jnp.log(probs)


def initialize(tree, decisions, key, cfg: MCTSConfig, valid):
    """Seed the root with the network eval plus Dirichlet exploration noise
    (reference mcts/__init__.py:72-80)."""
    noised = dirichlet_noise(key, decisions["logits"], valid, cfg.noise_eps, cfg.alpha_scale)
    return tree.replace(
        logits=tree.logits.at[:, 0].set(noised.astype(tree.logits.dtype)),
        v=tree.v.at[:, 0].set(decisions["v"].astype(tree.v.dtype)),
        sim=jnp.array(1, jnp.int32),
    )


# --------------------------------------------------------------------------
# The regularized-policy solve
# --------------------------------------------------------------------------

def solve_policy(pi, q, lambda_n, tol=1e-3, max_iters=100):
    """Solve pi_bar(a) = lambda_n*pi(a)/(alpha - q(a)) with alpha chosen by
    Newton iteration so sum_a pi_bar = 1, vectorized over envs.

    pi: (B,A) prior probs (0 at invalid actions); q: (B,A) in [0,1];
    lambda_n: (B,). Mirrors the per-thread shared-memory solve of
    mcts/cpp/cuda.cu:35-68 as (B,A) VPU math.
    """
    lam = lambda_n[:, None].astype(jnp.float32)
    pi = pi.astype(jnp.float32)
    q = q.astype(jnp.float32)

    gap = jnp.maximum(lam * pi, 1e-4)
    alpha0 = jnp.max(q + gap, -1)
    floor = jnp.max(q, -1) + 1e-6  # keep alpha strictly above every q

    def cond(carry):
        _, _, done, t = carry
        return (~done).any() & (t < max_iters)

    def body(carry):
        alpha, last_err, done, t = carry
        denom = alpha[:, None] - q
        s = (lam * pi / denom).sum(-1)
        g = (-lam * pi / jnp.square(denom)).sum(-1)
        err = s - 1.0
        newly_done = (err < tol) | (err == last_err)
        step = jnp.where(done | newly_done, 0.0, err / g)
        alpha = jnp.maximum(alpha - step, floor)
        return alpha, jnp.where(done, last_err, err), done | newly_done, t + 1

    alpha, _, _, _ = jax.lax.while_loop(
        cond, body, (alpha0, jnp.full_like(alpha0, jnp.inf), jnp.zeros(alpha0.shape, bool), 0)
    )
    return lam * pi / (alpha[:, None] - q)


def _node_policy(tree, t, q_all):
    """pi_bar for node index t (B,) of every env.

    Gathers per-child q and visit counts exactly as mcts/cpp/cuda.cu:70-99:
    unexpanded children contribute q=0 and count 1 to N.
    """
    B, T, A = tree.children.shape
    envs = jnp.arange(B)

    children = tree.children[envs, t]  # (B,A)
    logits = tree.logits[envs, t].astype(jnp.float32)  # (B,A)
    seat = tree.seats[envs, t]  # (B,)

    expanded = children > -1
    safe_child = jnp.where(expanded, children, 0)
    q = jnp.where(expanded, q_all[envs[:, None], safe_child, seat[:, None]], 0.0)
    counts = jnp.where(expanded, tree.n[envs[:, None], safe_child], 1)

    pi = jnp.exp(logits)
    N = counts.sum(-1)
    lambda_n = tree.c_puct * N.astype(jnp.float32) / (N + A).astype(jnp.float32)
    return solve_policy(pi, q, lambda_n)


def _transition_q(tree):
    """Per-(node, seat) q estimates min-max normalised to [0,1] *globally*
    across the whole batch/tree, exactly as the reference
    (mcts/cpp/cuda.cu:101-105)."""
    q = tree.w / (tree.n[..., None].astype(jnp.float32) + 1e-4)
    lo, hi = q.min(), q.max()
    return (q - lo) / (hi - lo + 1e-4)


def _sample(probs, rand):
    """Inverse-CDF draw with the reference's edge-case fallback: first action
    with positive probability whose cumulative sum reaches rand, else the
    last positive-probability action (mcts/cpp/cuda.cu:157-175)."""
    A = probs.shape[-1]
    cum = jnp.cumsum(probs, -1)
    pos = probs > 0
    ok = pos & (cum >= rand[:, None])
    first_ok = jnp.argmax(ok, -1)
    last_pos = A - 1 - jnp.argmax(pos[:, ::-1], -1)
    return jnp.where(ok.any(-1), first_ok, last_pos).astype(jnp.int32)


def descend(tree, rands):
    """Walk each env's tree from the root, sampling from the solved pi_bar at
    every node (using the pre-drawn uniform rands (B,T), one per node as in
    cuda.cu:184-203), until hitting a terminal or unexpanded child.

    Returns (parents, actions): the node to expand from and the action taken.
    """
    B, T, A = tree.children.shape
    envs = jnp.arange(B)
    q_all = _transition_q(tree)

    t0 = jnp.zeros((B,), jnp.int32)
    parent0 = jnp.zeros((B,), jnp.int32)
    action0 = jnp.full((B,), -1, jnp.int32)

    def active_of(t):
        return (t != -1) & ~tree.terminal[envs, jnp.clip(t, 0)]

    def cond(carry):
        t, parent, action = carry
        return active_of(t).any()

    def body(carry):
        t, parent, action = carry
        active = active_of(t)
        safe_t = jnp.clip(t, 0)
        probs = _node_policy(tree, safe_t, q_all)
        a = _sample(probs, rands[envs, safe_t])
        parent = jnp.where(active, safe_t, parent)
        action = jnp.where(active, a, action)
        t = jnp.where(active, tree.children[envs, safe_t, a], t)
        return t, parent, action

    _, parents, actions = jax.lax.while_loop(cond, body, (t0, parent0, action0))
    return parents, actions


def backup(tree, leaves, n_per_visit):
    """Propagate the leaf value to the root, zeroing at terminal nodes and
    accumulating per-node rewards (reference mcts/cpp/cuda.cu:205-236).

    n_per_visit: how much each visit adds to n — n_seats replicates the
    reference's per-seat increment (see module docstring), 1 is the fix.
    """
    B, T, S = tree.w.shape
    envs = jnp.arange(B)

    v0 = tree.v[envs, leaves]  # (B,S)
    current0 = leaves.astype(jnp.int32)

    def cond(carry):
        _, current, _, _ = carry
        return (current != -1).any()

    def body(carry):
        v, current, n, w = carry
        active = current != -1
        safe = jnp.clip(current, 0)
        v = jnp.where((tree.terminal[envs, safe] & active)[:, None], 0.0, v)
        v = v + jnp.where(active[:, None], tree.rewards[envs, safe], 0.0)
        n = n.at[envs, safe].add(jnp.where(active, n_per_visit, 0))
        w = w.at[envs, safe].add(jnp.where(active[:, None], v, 0.0))
        current = jnp.where(active, tree.parents[envs, safe], -1)
        return v, current, n, w

    _, _, n, w = jax.lax.while_loop(cond, body, (v0, current0, tree.n, tree.w))
    return tree.replace(n=n, w=w)


# --------------------------------------------------------------------------
# Simulation step and driver
# --------------------------------------------------------------------------

def simulate(tree, eval_fn, key, cfg: MCTSConfig):
    """One MCTS simulation for every env: descend, expand, step the env,
    evaluate the leaf with the network, back up (reference
    mcts/__init__.py:108-140)."""
    B, T, A = tree.children.shape
    envs = jnp.arange(B)
    k_rand, k_eval = jax.random.split(key)

    rands = jax.random.uniform(k_rand, (B, T))
    parents, actions = descend(tree, rands)

    # Reuse the existing child slot if this (parent, action) edge was already
    # expanded (terminal transitions stop descents early) — else allocate slot
    # `sim` (mcts/__init__.py:115-122).
    existing = tree.children[envs, parents, actions]
    leaves = jnp.where(existing == -1, tree.sim, existing).astype(jnp.int32)

    children = tree.children.at[envs, parents, actions].set(leaves)
    parents_arr = tree.parents.at[envs, leaves].set(parents)
    relation = tree.relation.at[envs, leaves].set(actions)

    old_world = jax.tree.map(lambda x: x[envs, parents], tree.worlds)
    world, transition = old_world.step(actions)

    decisions = eval_fn(world, k_eval)

    tree = tree.replace(
        children=children,
        parents=parents_arr,
        relation=relation,
        worlds=jax.tree.map(lambda full, new: full.at[envs, leaves].set(new), tree.worlds, world),
        seats=tree.seats.at[envs, leaves].set(world.seats.astype(jnp.int32)),
        terminal=tree.terminal.at[envs, leaves].set(transition.terminal),
        rewards=tree.rewards.at[envs, leaves].set(transition.rewards.astype(tree.rewards.dtype)),
        logits=tree.logits.at[envs, leaves].set(decisions["logits"].astype(tree.logits.dtype)),
        v=tree.v.at[envs, leaves].set(decisions["v"].astype(tree.v.dtype)),
        sim=tree.sim + 1,
    )

    n_per_visit = tree.w.shape[-1] if cfg.backup_n == "seats" else 1
    return backup(tree, leaves, n_per_visit)


def root(tree):
    """The improved root policy (training target), prior, and root value
    (reference mcts/__init__.py:142-149)."""
    B = tree.children.shape[0]
    q_all = _transition_q(tree)
    probs = _node_policy(tree, jnp.zeros((B,), jnp.int32), q_all)
    return {
        "logits": jnp.log(probs),
        "prior": tree.logits[:, 0].astype(jnp.float32),
        "v": tree.v[:, 0],
    }


def n_leaves(tree):
    """Number of leaf nodes per env (reference mcts/__init__.py:151-152)."""
    return ((tree.children == -1).all(-1) & (tree.parents != -1)).sum(-1)


def mcts(world, eval_fn, key, cfg: MCTSConfig):
    """Full search: initialize the root, then n_nodes-1 simulations as one
    `lax.scan` (reference mcts/__init__.py:200-207)."""
    k_init, k_sims = jax.random.split(key)

    tree = build(world, cfg)
    decisions = eval_fn(world, None)
    tree = initialize(tree, decisions, k_init, cfg, world.valid)

    def body(tree, k):
        return simulate(tree, eval_fn, k, cfg), None

    keys = jax.random.split(k_sims, cfg.n_nodes - 1)
    tree, _ = jax.lax.scan(body, tree, keys)
    return tree


class MCTSAgent:
    """Agent protocol over MCTS: `agent(world, key, eval=False)` returns the
    improved policy, sampled/argmax action and telemetry (reference
    mcts/__init__.py:209-241)."""

    def __init__(self, eval_fn, **kwargs):
        self.eval_fn = eval_fn
        self.cfg = MCTSConfig(**kwargs)

    def __call__(self, world, key, eval=False, **overrides):
        cfg = replace(self.cfg, **overrides) if overrides else self.cfg
        k_search, k_act = jax.random.split(key)
        tree = mcts(world, self.eval_fn, k_search, cfg)
        r = root(tree)
        actions = (
            jnp.argmax(r["logits"], -1)
            if eval
            else jax.random.categorical(k_act, r["logits"], axis=-1)
        )
        B = world.n_envs
        return {
            "logits": r["logits"],
            "prior": r["prior"],
            "v": r["v"],
            "actions": actions.astype(jnp.int32),
            "n_sims": jnp.full((B,), cfg.n_nodes, jnp.int32),
            "n_leaves": n_leaves(tree),
        }


class DummyAgent:
    """No-search baseline: act straight from the network (reference
    mcts/__init__.py:243-257)."""

    def __init__(self, eval_fn):
        self.eval_fn = eval_fn

    def __call__(self, world, key, eval=False):
        r = self.eval_fn(world, None)
        actions = (
            jnp.argmax(r["logits"], -1)
            if eval
            else jax.random.categorical(key, r["logits"], axis=-1)
        )
        B = world.n_envs
        return {
            "logits": r["logits"],
            "prior": r["logits"],
            "v": r["v"],
            "actions": actions.astype(jnp.int32),
            "n_sims": jnp.zeros((B,), jnp.int32),
            "n_leaves": jnp.ones((B,), jnp.int32),
        }
