"""Pallas TPU kernels for the MCTS hot path.

Why these exist: the XLA formulation of descend/backup re-reads the whole
(B, T, A) tree tensors once per tree LEVEL (per-env row gathers lower to
full-tensor scans), so a 20-level descend costs ~80 full passes over HBM.
These kernels stream each env-block's tree slice into VMEM ONCE and do the
entire walk there:

  descend:  grid over env blocks of E envs; all levels of the walk run on
            VMEM-resident rows, vectorized (E, A) Newton solves on the VPU,
            inverse-CDF sampling via a triangular-ones matmul on the MXU.
            HBM traffic: one read of the tree slice per call.
  backup:   same blocking; leaf->root walks accumulate (B, T) node deltas
            in VMEM; edge tensors are updated outside with one scatter each
            (edge stats mirror child node stats through parents/relation).

Semantics match mcts/search.py's XLA versions exactly (same regularized
policy, same reference quirks) — `tests/test_pallas.py` asserts descend
equality on identical rands and backup equality against the XLA kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF_PROXY = -1e4


def _shardwrap(inner, mesh, axis, n_batch_args, n_rep_args, n_outs):
    """Wrap a pallas_call invocation in shard_map over the env axis.

    pallas_call is a custom call XLA cannot partition on its own; under a
    mesh, each shard must run the kernel on its local env block. The first
    `n_batch_args` operands shard on axis 0; the next `n_rep_args` are
    replicated (e.g. the global q-bounds, computed OUTSIDE so normalization
    stays bit-identical to the single-chip semantics).
    """
    if mesh is None:
        return inner
    from jax.sharding import PartitionSpec as P

    in_specs = tuple([P(axis)] * n_batch_args + [P()] * n_rep_args)
    out_specs = tuple([P(axis)] * n_outs) if n_outs > 1 else P(axis)
    return jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def _solve_policy_rows(pi, q, lam, n_iters=16, tol=1e-3):
    """Vectorized Newton solve on (E, A) rows — mirrors search.solve_policy
    (single reciprocal per iteration, hoisted numerator: bit-identical to the
    XLA version, which uses the same formulation)."""
    lampi = lam * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, axis=-1, keepdims=True)
    floor = jnp.max(q, axis=-1, keepdims=True) + 1e-6
    done = jnp.zeros_like(alpha, dtype=jnp.bool_)

    for _ in range(n_iters):
        r = 1.0 / (alpha - q)
        terms = lampi * r
        s = terms.sum(-1, keepdims=True)
        g = -(terms * r).sum(-1, keepdims=True)
        err = s - 1.0
        done = done | (err < tol)
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, err / g), floor)

    return lampi / (alpha - q)


def _solve_probs_kernel(
    logits_ref, ne_ref, we_ref, cp_ref, qb_ref, probs_ref,
    *, A, n_iters, accel, tol=1e-3, out_alpha=False,
):
    """The regularized-policy solve alone, on flattened (rows, A) blocks —
    rows = env*node pairs, every iteration VMEM-resident.

    Why this shape wins where `node_actions_multi` lost: the (E, T, A)
    solve+sample kernel pays per-K sampling loops and tiles poorly (T=65
    sublanes, A=81 lanes both pad), while the solve itself is row-independent
    — flattening to (rows, A) gives Mosaic dense (R, A) tiles and the whole
    6-iteration Halley chain runs on one VMEM residency. The XLA formulation
    of the same math re-streams the (B,T,A) intermediates through HBM every
    iteration because the lane reductions break fusion (device trace: solve =
    27.6ms/pass of a 60ms pass at 16k envs 9x9, vs a 6.2ms roofline); here
    HBM traffic is one read of logits/n_edge/w_edge and one write of probs.

    Inputs stream at their STORAGE dtypes (bf16 n_edge under the compact
    tree) and upcast in VMEM — same values the XLA path sees after its own
    astype(f32). Same iteration rule as search.solve_policy (safeguarded
    Halley under accel=True), so results match the XLA path to f32 roundoff;
    sampling stays outside (the matmul-cum sampler needs HIGHEST-precision
    MXU, which in-kernel dot_general does not provide).
    """
    pi = jnp.exp(logits_ref[:, :].astype(jnp.float32))
    ne = ne_ref[:, :].astype(jnp.float32)
    we = we_ref[:, :].astype(jnp.float32)
    cp = cp_ref[:, :].astype(jnp.float32)  # (R,1)
    qlo = qb_ref[0, 0]
    qhi = qb_ref[0, 1]

    expanded = ne > 0
    q = jnp.where(expanded, (we / (ne + 1e-4) - qlo) / (qhi - qlo + 1e-4), 0.0)
    counts = jnp.where(expanded, ne, 1.0)
    N = counts.sum(-1, keepdims=True)  # (R,1)
    lam = cp * N / (N + A)

    # identical formulation to search.solve_policy (hoisted numerator, one
    # reciprocal per iteration, safeguarded-Halley acceleration)
    lampi = lam * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, axis=-1, keepdims=True)
    floor = jnp.max(q, axis=-1, keepdims=True) + 1e-6
    done = jnp.zeros_like(alpha, dtype=jnp.bool_)
    for _ in range(n_iters):
        r = 1.0 / (alpha - q)
        terms = lampi * r
        s = terms.sum(-1, keepdims=True)
        g = -(terms * r).sum(-1, keepdims=True)
        err = s - 1.0
        step = err / g
        if accel:
            done = done | (jnp.abs(err) < tol)
            h = 2.0 * (terms * r * r).sum(-1, keepdims=True)
            t = err * h / (2.0 * g * g)
            ok = (err > 0) & (t < 0.75)
            step = jnp.where(ok, step / jnp.maximum(1.0 - t, 0.25), step)
        else:
            done = done | (err < tol)
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, step), floor)

    if out_alpha:
        # alpha-only output: (R,1) f32. The caller recomputes
        # probs = lampi/(alpha - q) in XLA, where it FUSES into the sampler's
        # cum matmul — so the (rows, A) f32 probs tensor never touches HBM
        # (materializing it is what made the probs-mode kernel lose on the
        # grow path, 295->404ms; see _pallas_solve_enabled).
        probs_ref[:, :] = alpha
    else:
        probs_ref[:, :] = lampi / (alpha - q)


def _largest_divisor(n, candidates=(1024, 512, 256, 128, 64, 32, 16, 8)):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def solve_probs(tree, q_bounds, n_iters=6, accel=True, block_rows=None,
                interpret=False, mesh=None, mesh_axis="dp", out="probs"):
    """Pallas twin of search.node_probs (cold start): all-node regularized-
    policy solve -> probs (B,T,A) f32, or just the converged Newton roots
    alpha (B,T) f32 with out="alpha" (HBM writes shrink by A; the caller
    derives probs in XLA where they fuse into the sampler). q_bounds stays a
    GLOBAL reduction computed outside (bit-parity with the single-chip path
    under a mesh)."""
    B, T, A = tree.children.shape
    out_alpha = out == "alpha"
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    rows = (B // shards) * T
    R = block_rows or _largest_divisor(rows)
    assert R is not None and rows % R == 0, (
        f"per-shard rows {rows} need a block divisor (got block_rows={block_rows})"
    )
    qb = jnp.stack([q_bounds[0], q_bounds[1]]).reshape(1, 2).astype(jnp.float32)
    # c_puct is per-env: broadcast onto rows once (a (rows,1) f32 stream is
    # ~1% of the row tensors)
    cp = jnp.broadcast_to(tree.c_puct[:, None], (B, T)).astype(jnp.float32)

    def inner(logits, ne, we, cp, qb):
        Bl = logits.shape[0]
        rows_l = Bl * T
        flat = lambda x: x.reshape(rows_l, A)
        grid = (rows_l // R,)
        row_spec = pl.BlockSpec((R, A), lambda i: (i, 0), memory_space=pltpu.VMEM)
        one_spec = pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _solve_probs_kernel, A=A, n_iters=n_iters, accel=accel,
            out_alpha=out_alpha,
        )
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                row_spec,  # logits (storage dtype)
                row_spec,  # n_edge (storage dtype)
                row_spec,  # w_edge
                one_spec,  # c_puct per row
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=one_spec if out_alpha else row_spec,
            out_shape=jax.ShapeDtypeStruct(
                (rows_l, 1) if out_alpha else (rows_l, A), jnp.float32),
            interpret=interpret,
        )(flat(logits), flat(ne), flat(we), cp.reshape(rows_l, 1), qb)
        return res.reshape((Bl, T) if out_alpha else (Bl, T, A))

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=4, n_rep_args=1, n_outs=1)
    return inner(tree.logits, tree.n_edge, tree.w_edge.astype(jnp.float32), cp, qb)


def _node_actions_kernel(
    logits_ref, ne_ref, we_ref, ch_ref, rands_ref, cp_ref, qb_ref,
    actions_ref, child_ref, *, E, T, A, n_actions,
):
    """Solve pi_bar and sample an action for every (env, node) of the block in
    one shot — no walk, no dynamic indexing: pure (E,T,A) vector math with
    lane reductions, so Mosaic tiles it perfectly and HBM traffic is one read
    of the tree slice (the XLA formulation re-reads the (B,T,A) tensors ~16x
    across the unrolled Newton iterations; VMEM residency is the entire win).
    """
    qlo = qb_ref[0, 0]
    qhi = qb_ref[0, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (E, T, A), 2)
    valid_lane = lane < n_actions
    cp = cp_ref[:, 0:1][:, :, None]  # (E,1,1)

    logits = logits_ref[:, :, :]
    ne = ne_ref[:, :, :]
    we = we_ref[:, :, :]

    # mask padded lanes explicitly: valid-action logits are finite and invalid
    # ones are NEG_INF_PROXY (exp -> 0), so pi=0 on pads reproduces XLA exactly
    pi = jnp.where(valid_lane, jnp.exp(logits), 0.0)
    expanded = ne > 0
    q = jnp.where(expanded, (we / (ne + 1e-4) - qlo) / (qhi - qlo + 1e-4), 0.0)
    counts = jnp.where(expanded, ne, jnp.where(valid_lane, 1.0, 0.0))
    N = counts.sum(-1, keepdims=True)  # (E,T,1)
    lam = cp * N / (N + n_actions)

    # Newton solve, (E,T,A) vectorized — mirrors search.solve_policy
    # (identical single-reciprocal formulation for bit-parity)
    lampi = lam * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, axis=-1, keepdims=True)
    floor = jnp.max(q, axis=-1, keepdims=True) + 1e-6
    done = jnp.zeros_like(alpha, dtype=jnp.bool_)
    for _ in range(16):
        r = 1.0 / (alpha - q)
        terms = lampi * r
        s = terms.sum(-1, keepdims=True)
        g = -(terms * r).sum(-1, keepdims=True)
        err = s - 1.0
        done = done | (err < 1e-3)
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, err / g), floor)
    probs = lampi / (alpha - q)

    # inverse-CDF sample via log-shift prefix sum (exact f32; jnp.cumsum is
    # not lowered by Mosaic and an MXU matmul would round at bf16)
    cum = probs
    shift = 1
    while shift < A:
        cum = cum + jnp.pad(cum, ((0, 0), (0, 0), (shift, 0)))[:, :, :A]
        shift *= 2
    rand = rands_ref[:, :][:, :, None]
    pos = probs > 0
    ok = pos & (cum >= rand)
    BIG = jnp.int32(A + 1)
    first_ok = jnp.min(jnp.where(ok, lane, BIG), axis=-1)
    last_pos = jnp.max(jnp.where(pos, lane, -1), axis=-1)
    a = jnp.where(first_ok < BIG, first_ok, last_pos).astype(jnp.int32)

    onehot = (lane == a[:, :, None]).astype(jnp.float32)
    child = (ch_ref[:, :, :] * onehot).sum(-1).astype(jnp.int32)

    actions_ref[:, :] = a
    child_ref[:, :] = child


def node_actions(tree, rands, q_bounds, block_envs=16, interpret=False, mesh=None, mesh_axis="dp"):
    """Pallas twin of search.node_actions(tree, rands, q_bounds) ->
    (actions (B,T) int32, child (B,T) int32). Feeds search.descend's pointer
    chase; q_bounds stays a GLOBAL reduction computed outside (bit-parity
    with the single-chip path under a mesh)."""
    B, T, A = tree.children.shape
    E = block_envs
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    assert (B // shards) % E == 0, (
        f"per-shard envs {B}//{shards} must be divisible by block_envs {E}"
    )
    qb = jnp.stack([q_bounds[0], q_bounds[1]]).reshape(1, 2)

    def inner(logits, ne, we, ch, rands, cp, qb):
        Bl = logits.shape[0]
        grid = (Bl // E,)
        row_spec = pl.BlockSpec((E, T, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((E, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_node_actions_kernel, E=E, T=T, A=A, n_actions=A)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                row_spec,  # logits
                row_spec,  # n_edge
                row_spec,  # w_edge
                row_spec,  # children (as f32)
                vec_spec,  # rands
                pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),  # c_puct
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),  # q bounds
            ],
            out_specs=[vec_spec, vec_spec],
            out_shape=[
                jax.ShapeDtypeStruct((Bl, T), jnp.int32),
                jax.ShapeDtypeStruct((Bl, T), jnp.int32),
            ],
            interpret=interpret,
        )(logits, ne, we, ch, rands, cp, qb)

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=6, n_rep_args=1, n_outs=2)
    return inner(
        tree.logits.astype(jnp.float32),
        tree.n_edge.astype(jnp.float32),
        tree.w_edge.astype(jnp.float32),
        tree.children.astype(jnp.float32),
        rands.astype(jnp.float32),
        tree.c_puct.astype(jnp.float32)[:, None],
        qb.astype(jnp.float32),
    )


def _node_actions_multi_kernel(
    logits_ref, ne_ref, we_ref, ch_ref, rands_ref, cp_ref, qb_ref,
    actions_ref, child_ref, *, E, K, T, A, n_actions, n_iters=16,
    accel=False,
):
    """`_node_actions_kernel` with K rand sets sharing ONE VMEM-resident
    Newton solve — the kernel for the multi-leaf search's solve+sample stage
    (the XLA pair costs ~24ms/pass at 16k envs re-streaming the (B,T,A)
    intermediates through HBM; everything here stays in VMEM)."""
    qlo = qb_ref[0, 0]
    qhi = qb_ref[0, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (E, T, A), 2)
    valid_lane = lane < n_actions
    cp = cp_ref[:, 0:1][:, :, None]  # (E,1,1)

    logits = logits_ref[:, :, :]
    ne = ne_ref[:, :, :]
    we = we_ref[:, :, :]

    pi = jnp.where(valid_lane, jnp.exp(logits), 0.0)
    expanded = ne > 0
    q = jnp.where(expanded, (we / (ne + 1e-4) - qlo) / (qhi - qlo + 1e-4), 0.0)
    counts = jnp.where(expanded, ne, jnp.where(valid_lane, 1.0, 0.0))
    N = counts.sum(-1, keepdims=True)
    lam = cp * N / (N + n_actions)

    lampi = lam * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, axis=-1, keepdims=True)
    floor = jnp.max(q, axis=-1, keepdims=True) + 1e-6
    done = jnp.zeros_like(alpha, dtype=jnp.bool_)
    # same iteration rule as search.solve_policy (incl. the safeguarded-
    # Halley acceleration) so the kernel stays bit-equal to the XLA path
    # under identical (n_iters, accel) settings
    for _ in range(n_iters):
        r = 1.0 / (alpha - q)
        terms = lampi * r
        s = terms.sum(-1, keepdims=True)
        g = -(terms * r).sum(-1, keepdims=True)
        err = s - 1.0
        step = err / g
        if accel:
            done = done | (jnp.abs(err) < 1e-3)
            h = 2.0 * (terms * r * r).sum(-1, keepdims=True)
            t = err * h / (2.0 * g * g)
            ok = (err > 0) & (t < 0.75)
            step = jnp.where(ok, step / jnp.maximum(1.0 - t, 0.25), step)
        else:
            done = done | (err < 1e-3)
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, step), floor)
    probs = lampi / (alpha - q)

    # ONE log-shift prefix sum; K compare/select passes (same dataflow as
    # search._sample_children_multi, so the paths sample bit-equally)
    cum = probs
    shift = 1
    while shift < A:
        cum = cum + jnp.pad(cum, ((0, 0), (0, 0), (shift, 0)))[:, :, :A]
        shift *= 2
    pos = probs > 0
    BIG = jnp.int32(A + 1)
    last_pos = jnp.max(jnp.where(pos, lane, -1), axis=-1)  # (E,T)
    CH = ch_ref[:, :, :]

    for k in range(K):
        rand = rands_ref[:, k, :][:, :, None]  # (E,T,1)
        ok = pos & (cum >= rand)
        first_ok = jnp.min(jnp.where(ok, lane, BIG), axis=-1)
        a_k = jnp.where(first_ok < BIG, first_ok, last_pos).astype(jnp.int32)
        onehot = (lane == a_k[:, :, None]).astype(jnp.float32)
        c_k = (CH * onehot).sum(-1).astype(jnp.int32)
        actions_ref[:, k, :] = a_k
        child_ref[:, k, :] = c_k


def node_actions_multi(tree, rands, q_bounds, block_envs=16, interpret=False,
                       mesh=None, mesh_axis="dp", n_iters=16, accel=False):
    """Pallas twin of search's node_probs + _sample_children_multi:
    rands (B,K,T) -> (actions (B,K,T) int32, child (B,K,T) int32)."""
    B, T, A = tree.children.shape
    K = rands.shape[1]
    E = block_envs
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    assert (B // shards) % E == 0, (
        f"per-shard envs {B}//{shards} must be divisible by block_envs {E}"
    )
    qb = jnp.stack([q_bounds[0], q_bounds[1]]).reshape(1, 2)

    def inner(logits, ne, we, ch, rands, cp, qb):
        Bl = logits.shape[0]
        grid = (Bl // E,)
        row_spec = pl.BlockSpec((E, T, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        k_spec = pl.BlockSpec((E, K, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _node_actions_multi_kernel, E=E, K=K, T=T, A=A, n_actions=A,
            n_iters=n_iters, accel=accel,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                row_spec,  # logits
                row_spec,  # n_edge
                row_spec,  # w_edge
                row_spec,  # children (as f32)
                k_spec,  # rands
                pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[k_spec, k_spec],
            out_shape=[
                jax.ShapeDtypeStruct((Bl, K, T), jnp.int32),
                jax.ShapeDtypeStruct((Bl, K, T), jnp.int32),
            ],
            interpret=interpret,
        )(logits, ne, we, ch, rands, cp, qb)

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=6, n_rep_args=1, n_outs=2)
    return inner(
        tree.logits.astype(jnp.float32),
        tree.n_edge.astype(jnp.float32),
        tree.w_edge.astype(jnp.float32),
        tree.children.astype(jnp.float32),
        rands.astype(jnp.float32),
        tree.c_puct.astype(jnp.float32)[:, None],
        qb.astype(jnp.float32),
    )


def _sample_children_kernel(
    probs_ref, ch_ref, rands_ref, actions_ref, child_ref, *, E, K, T, A,
):
    """K inverse-CDF draws per node from PRECOMPUTED probs, plus the child
    pointer lookups — sampling only (the Newton solve stays in XLA where its
    unrolled elementwise chain fuses well). One VMEM residency replaces the
    XLA sampler's ~K re-reads of the (B,T,A) cum/children tensors through
    HBM. Same log-shift prefix sum and masked-iota selects as
    search._sample_children_multi, so actions match bitwise."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (E, T, A), 2)
    probs = probs_ref[:, :, :]

    cum = probs
    shift = 1
    while shift < A:
        cum = cum + jnp.pad(cum, ((0, 0), (0, 0), (shift, 0)))[:, :, :A]
        shift *= 2
    pos = probs > 0
    BIG = jnp.int32(A + 1)
    last_pos = jnp.max(jnp.where(pos, lane, -1), axis=-1)  # (E,T)
    CH = ch_ref[:, :, :].astype(jnp.float32)

    for k in range(K):
        rand = rands_ref[:, k, :][:, :, None]  # (E,T,1)
        ok = pos & (cum >= rand)
        first_ok = jnp.min(jnp.where(ok, lane, BIG), axis=-1)
        a_k = jnp.where(first_ok < BIG, first_ok, last_pos).astype(jnp.int32)
        onehot = (lane == a_k[:, :, None]).astype(jnp.float32)
        c_k = (CH * onehot).sum(-1).astype(jnp.int32)
        actions_ref[:, k, :] = a_k
        child_ref[:, k, :] = c_k


def sample_children_multi(probs, children, rands, block_envs=64,
                          interpret=False, mesh=None, mesh_axis="dp"):
    """Pallas twin of search._sample_children_multi: probs (B,T,A) f32,
    children (B,T,A) int, rands (B,K,T) f32 -> (actions, child) (B,K,T) i32.
    Children stream in bf16 (node ids <= 127 are exact) to halve their HBM
    read."""
    B, T, A = probs.shape
    K = rands.shape[1]
    E = block_envs
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    assert (B // shards) % E == 0, (
        f"per-shard envs {B}//{shards} must be divisible by block_envs {E}"
    )

    def inner(probs, ch, rands):
        Bl = probs.shape[0]
        grid = (Bl // E,)
        row_spec = pl.BlockSpec((E, T, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        k_spec = pl.BlockSpec((E, K, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_sample_children_kernel, E=E, K=K, T=T, A=A)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec, row_spec, k_spec],
            out_specs=[k_spec, k_spec],
            out_shape=[
                jax.ShapeDtypeStruct((Bl, K, T), jnp.int32),
                jax.ShapeDtypeStruct((Bl, K, T), jnp.int32),
            ],
            interpret=interpret,
        )(probs, ch, rands)

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=3, n_rep_args=0, n_outs=2)
    return inner(
        probs.astype(jnp.float32),
        children.astype(jnp.bfloat16),
        rands.astype(jnp.float32),
    )


def _walk_kernel(
    acts_ref, nxt_ref, term_ref, rootterm_ref, out_ref, *, E, T,
):
    """The root->leaf pointer chase of search._walk, fully in VMEM.

    Pure integer logic, bit-identical to the XLA unrolled walk — but where
    XLA lowers each level's masked reductions to separate kernels (~0.2ms x
    3 x T levels), here the whole chase is one kernel over (E,T) blocks: T
    unrolled levels of one-hot selects on VMEM-resident i32 tiles.

    SINGLE packed output (E, T+3): lanes 0..T-1 the path, then parents /
    actions / halt_child. Separate (B,1) outputs each tile-pad their lane dim
    to 128 and the compiler allocates whole pallas outputs inside loop bodies
    in scoped VMEM — three padded (B,128) i32 outputs blow the 16MB scoped
    limit at 16k envs (measured 22.56M); the packed form pads once.
    """
    node_iota = jax.lax.broadcasted_iota(jnp.int32, (E, T), 1)
    ACTS = acts_ref[:, :]
    NXT = nxt_ref[:, :]
    TERM = term_ref[:, :]  # i32 0/1

    # EARLY-EXIT while loop over levels: a T-unrolled chase costs T x ~8
    # (E,T) VPU ops even though the deepest live walk in a 64-node tree is
    # usually <10 levels; looping `while any(active)` does only the work the
    # deepest walk in the block needs. Iterations past all-halt are no-ops
    # in the unrolled form, so the exit is bit-exact. Masks ride as i32
    # (Mosaic while-carries want 32-bit vectors); the path accumulates in a
    # VMEM-register (E,T) matrix — per-level single-lane stores cost a tile
    # RMW each (~42ms/pass measured); one full-tile write at the end is free.
    def cond(carry):
        level, t, active, parents, actions, halt_child, path = carry
        return (jnp.max(active) > 0) & (level < T)

    def body(carry):
        level, t, active, parents, actions, halt_child, path = carry
        act_b = active > 0
        sel = ((node_iota == t[:, None]) & act_b[:, None]).astype(jnp.int32)
        a_t = (ACTS * sel).sum(-1)
        c_t = (NXT * sel).sum(-1)
        # halt AT node t: child unexpanded (-1) or terminal — the child
        # terminal lookup is one more one-hot select (matches search._halt_of)
        sel_c = (node_iota == c_t[:, None]).astype(jnp.int32)
        t_child = (TERM * sel_c).sum(-1)
        h_t = (c_t < 0) | (t_child > 0)
        parents = jnp.where(act_b, t, parents)
        actions = jnp.where(act_b, a_t, actions)
        lvl_lane = node_iota == level  # (E,T) one-hot on the level lane
        path = jnp.where(lvl_lane & act_b[:, None], t[:, None], path)
        newly = act_b & h_t
        halt_child = jnp.where(newly, c_t, halt_child)
        act_b = act_b & ~h_t
        t = jnp.where(act_b, c_t, t)
        return (level + 1, t, act_b.astype(jnp.int32), parents, actions,
                halt_child, path)

    carry = (
        jnp.int32(0),
        jnp.zeros((E,), jnp.int32),
        (rootterm_ref[:, 0] < 1).astype(jnp.int32),
        jnp.zeros((E,), jnp.int32),
        jnp.full((E,), -1, jnp.int32),
        jnp.full((E,), -1, jnp.int32),
        jnp.full((E, T), -1, jnp.int32),
    )
    _, _, _, parents, actions, halt_child, path = jax.lax.while_loop(
        cond, body, carry
    )

    out_ref[:, :T] = path
    out_ref[:, T : T + 1] = parents[:, None]
    out_ref[:, T + 1 : T + 2] = actions[:, None]
    out_ref[:, T + 2 : T + 3] = halt_child[:, None]


def walk(terminal, acts, nxt, block_envs=256, interpret=False, mesh=None, mesh_axis="dp"):
    """Pallas twin of search's halt+_walk: (parents, actions, halt_child,
    path) from the per-node sampled actions and child pointers. `terminal`
    is the tree's (B,T) node-terminal flags; rows are independent, so a
    multi-leaf caller folds its K axis into B."""
    B, T = acts.shape
    E = block_envs
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    assert (B // shards) % E == 0, (
        f"per-shard envs {B}//{shards} must be divisible by block_envs {E}"
    )

    def inner(acts, nxt, term, rootterm):
        Bl = acts.shape[0]
        grid = (Bl // E,)
        vec_spec = pl.BlockSpec((E, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
        one_spec = pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((E, T + 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_walk_kernel, E=E, T=T)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vec_spec, vec_spec, vec_spec, one_spec],
            out_specs=[out_spec],
            out_shape=[jax.ShapeDtypeStruct((Bl, T + 3), jnp.int32)],
            interpret=interpret,
        )(acts, nxt, term, rootterm)[0]

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=4, n_rep_args=0, n_outs=1)
    packed = inner(
        acts.astype(jnp.int32),
        nxt.astype(jnp.int32),
        terminal.astype(jnp.int32),
        terminal[:, 0:1].astype(jnp.int32),
    )
    return packed[:, T], packed[:, T + 1], packed[:, T + 2], packed[:, :T]


def _descend_kernel(
    logits_ref, ne_ref, we_ref, ch_ref, term_ref, rands_ref, cp_ref, qb_ref,
    parents_ref, actions_ref, *, E, T, A, n_actions,
):
    """Entire walk on VMEM-resident blocks; rows are extracted with one-hot
    reductions over the node axis (Mosaic forbids dynamic element indexing,
    and (E,T,A) masked reductions are cheap VPU work in VMEM)."""
    qlo = qb_ref[0, 0]
    qhi = qb_ref[0, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (E, A), 1)
    valid_lane = lane < n_actions
    node_iota2 = jax.lax.broadcasted_iota(jnp.int32, (E, T), 1)
    cp = cp_ref[:, 0:1]  # (E, 1)

    TERM = term_ref[:, :]
    RANDS = rands_ref[:, :]

    def rows_of(ref, t):
        # (E, A) = ref[e, t[e], :] — dynamic SUBLANE slices are supported by
        # Mosaic (dynamic lane indexing is not), so per-env row extraction is
        # O(A) instead of an O(T*A) masked reduction per level
        return jnp.concatenate(
            [ref[e, pl.ds(t[e], 1), :] for e in range(E)], axis=0
        )

    def scalars_of(block2, sel2):
        return (block2 * sel2).sum(-1)

    def sel_of(t):
        return (node_iota2 == t[:, None]).astype(jnp.float32)

    def active_of(t):
        term = scalars_of(TERM, sel_of(jnp.maximum(t, 0)))
        return (t >= 0) & (term < 0.5)

    def cond(carry):
        t, parent, action = carry
        return active_of(t).any()

    def body(carry):
        t, parent, action = carry
        active = active_of(t)
        safe_t = jnp.maximum(t, 0)
        sel = sel_of(safe_t)

        logits = rows_of(logits_ref, safe_t)
        ne = rows_of(ne_ref, safe_t)
        we = rows_of(we_ref, safe_t)

        pi = jnp.exp(logits)
        expanded = ne > 0
        q = jnp.where(expanded, (we / (ne + 1e-4) - qlo) / (qhi - qlo + 1e-4), 0.0)
        counts = jnp.where(expanded, ne, jnp.where(valid_lane, 1.0, 0.0))
        N = counts.sum(-1, keepdims=True)
        lam = cp * N / (N + n_actions)

        probs = _solve_policy_rows(pi, q, lam)

        # inverse-CDF sample: log-shift prefix sum along lanes (exact f32 —
        # an MXU triangular matmul would round at bf16 and flip samples)
        cum = probs
        shift = 1
        while shift < A:
            cum = cum + jnp.pad(cum, ((0, 0), (shift, 0)))[:, :A]
            shift *= 2
        rand = scalars_of(RANDS, sel)[:, None]
        pos = probs > 0
        ok = pos & (cum >= rand)
        BIG = jnp.int32(A + 1)
        first_ok = jnp.min(jnp.where(ok, lane, BIG), axis=-1)
        last_pos = jnp.max(jnp.where(pos, lane, -1), axis=-1)
        a = jnp.where(first_ok < BIG, first_ok, last_pos).astype(jnp.int32)

        ch = rows_of(ch_ref, safe_t).astype(jnp.float32)
        onehot = (lane == a[:, None]).astype(jnp.float32)
        child = (ch * onehot).sum(-1).astype(jnp.int32)

        parent = jnp.where(active, safe_t, parent)
        action = jnp.where(active, a, action)
        t = jnp.where(active, child, t)
        return t, parent, action

    t0 = jnp.zeros((E,), jnp.int32)
    p0 = jnp.zeros((E,), jnp.int32)
    a0 = jnp.full((E,), -1, jnp.int32)
    _, parents, actions = jax.lax.while_loop(cond, body, (t0, p0, a0))

    parents_ref[:, 0] = parents
    actions_ref[:, 0] = actions


def descend(tree, rands, block_envs=8, interpret=False, mesh=None, mesh_axis="dp"):
    """Pallas descend: same contract as search.descend(tree, rands).

    Under `mesh`, the kernel runs per-shard via shard_map (env axis split
    over `mesh_axis`); q-bounds stay a GLOBAL reduction so results are
    bit-identical to the single-chip path.
    """
    B, T, A = tree.children.shape
    E = block_envs
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    assert (B // shards) % E == 0, (
        f"per-shard envs {B}//{shards} must be divisible by block_envs {E}"
    )

    # q normalization bounds from node stats (parity with search._q_bounds)
    qn = tree.w / (tree.n[..., None].astype(jnp.float32) + 1e-4)
    q_bounds = jnp.stack([qn.min(), qn.max()])[None, :]  # (1, 2)

    def inner(logits, ne, we, ch, term, rands, cp, qb):
        Bl = logits.shape[0]
        grid = (Bl // E,)
        row_spec = pl.BlockSpec((E, T, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((E, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_descend_kernel, E=E, T=T, A=A, n_actions=A)
        parents, actions = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                row_spec,  # logits
                row_spec,  # n_edge
                row_spec,  # w_edge
                row_spec,  # children
                vec_spec,  # terminal
                vec_spec,  # rands
                pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),  # c_puct
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),  # q bounds
            ],
            out_specs=[
                pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bl, 1), jnp.int32),
                jax.ShapeDtypeStruct((Bl, 1), jnp.int32),
            ],
            interpret=interpret,
        )(logits, ne, we, ch, term, rands, cp, qb)
        return parents, actions

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=7, n_rep_args=1, n_outs=2)
    parents, actions = inner(
        tree.logits.astype(jnp.float32),
        tree.n_edge.astype(jnp.float32),
        tree.w_edge.astype(jnp.float32),
        tree.children.astype(jnp.int32),
        tree.terminal.astype(jnp.float32),
        rands.astype(jnp.float32),
        tree.c_puct.astype(jnp.float32)[:, None],
        q_bounds.astype(jnp.float32),
    )
    return parents[:, 0], actions[:, 0]


def _backup_kernel(
    vleaf_ref, leaves_ref, parents_ref, term_ref, rew_ref,
    dn_ref, dw_ref,
    *, E, T, S, n_per_visit,
):
    """Vectorized leaf->root walk accumulating only the small (E,T) node
    deltas in VMEM; edge updates are routed outside (see `backup`)."""
    node_iota = jax.lax.broadcasted_iota(jnp.int32, (E, T), 1)

    PAR = parents_ref[:, :].astype(jnp.float32)
    TERM = term_ref[:, :]
    npv = float(n_per_visit)

    def sel_of(t):
        return (node_iota == t[:, None]).astype(jnp.float32)

    def cond(carry):
        current, v, dn, dw = carry
        return (current >= 0).any()

    def body(carry):
        current, v, dn, dw = carry
        active = current >= 0
        sel = sel_of(jnp.maximum(current, 0)) * active[:, None].astype(jnp.float32)

        term = (TERM * sel).sum(-1)
        v = jnp.where(((term > 0.5) & active)[:, None], 0.0, v)
        rew = jnp.stack([(rew_ref[:, :, s] * sel).sum(-1) for s in range(S)], -1)
        v = v + jnp.where(active[:, None], rew, 0.0)

        dn = dn + sel * npv
        dw = dw + sel[:, :, None] * v[:, None, :]

        parent = (PAR * sel).sum(-1).astype(jnp.int32) + jnp.where(active, 0, -1)
        current = jnp.where(active, parent, -1)
        return current, v, dn, dw

    leaf = leaves_ref[:, 0]
    v0 = vleaf_ref[:, :]
    dn0 = jnp.zeros((E, T), jnp.float32)
    dw0 = jnp.zeros((E, T, S), jnp.float32)
    _, _, dn, dw = jax.lax.while_loop(cond, body, (leaf, v0, dn0, dw0))

    dn_ref[:, :] = dn
    dw_ref[:, :, :] = dw


def backup(tree, leaves, n_per_visit, block_envs=64, interpret=False, mesh=None, mesh_axis="dp"):
    """Pallas backup: same contract as search.backup(tree, leaves, npv).

    The kernel walks paths and emits (B,T) node deltas; node and edge tensors
    are then updated with vectorized adds / one scatter each (edge stats
    mirror child node stats through (parents, relation))."""
    B, T, S = tree.w.shape
    E = block_envs
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    assert (B // shards) % E == 0

    envs = jnp.arange(B)
    v0 = tree.v[envs, leaves]

    def inner(v0, leaves2, parents, term, rew):
        Bl = v0.shape[0]
        grid = (Bl // E,)
        spec_ts = pl.BlockSpec((E, T, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        spec_t = pl.BlockSpec((E, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
        spec_s = pl.BlockSpec((E, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
        spec_1 = pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_backup_kernel, E=E, T=T, S=S, n_per_visit=n_per_visit)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec_s, spec_1, spec_t, spec_t, spec_ts],
            out_specs=[spec_t, spec_ts],
            out_shape=[
                jax.ShapeDtypeStruct((Bl, T), jnp.float32),
                jax.ShapeDtypeStruct((Bl, T, S), jnp.float32),
            ],
            interpret=interpret,
        )(v0, leaves2, parents, term, rew)

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=5, n_rep_args=0, n_outs=2)
    dn, dw = inner(
        v0.astype(jnp.float32),
        leaves.astype(jnp.int32)[:, None],
        tree.parents,
        tree.terminal.astype(jnp.float32),
        tree.rewards.astype(jnp.float32),
    )

    # apply node deltas + route onto parent edges (matches search.backup)
    has_edge = tree.parents >= 0
    safe_p = jnp.clip(tree.parents, 0)
    safe_r = jnp.clip(tree.relation, 0)
    seat_p = jnp.take_along_axis(tree.seats, safe_p, axis=1)
    dw_parent = jnp.take_along_axis(
        dw, jnp.clip(seat_p, 0, S - 1)[..., None], axis=2
    )[..., 0]
    b_idx = jnp.broadcast_to(envs[:, None], (B, T))

    return tree.replace(
        n=tree.n + jnp.round(dn).astype(tree.n.dtype),
        w=tree.w + dw,
        n_edge=tree.n_edge.at[b_idx, safe_p, safe_r].add(
            jnp.where(has_edge, dn, 0.0).astype(tree.n_edge.dtype)
        ),
        w_edge=tree.w_edge.at[b_idx, safe_p, safe_r].add(
            jnp.where(has_edge, dw_parent, 0.0).astype(tree.w_edge.dtype)
        ),
    )


def _backup_dense_kernel(
    vleaf_ref, leaves_ref, parents_ref, relation_ref, seats_ref, term_ref, rew_ref,
    n_in, w_in, ne_in, we_in,
    n_out, w_out, ne_out, we_out,
    *, E, T, A, S, n_per_visit,
):
    """Leaf->root walk with IN-PLACE edge updates: node-axis bookkeeping uses
    cheap (E,T) mask ops; the (E,T,A) edge tensors are touched only by
    per-env dynamic-sublane row read-modify-writes (O(A) per level), never by
    full-block passes. Outputs alias inputs."""
    node_iota = jax.lax.broadcasted_iota(jnp.int32, (E, T), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)

    PAR = parents_ref[:, :].astype(jnp.float32)
    REL = relation_ref[:, :].astype(jnp.float32)
    SEATS = seats_ref[:, :].astype(jnp.float32)
    TERM = term_ref[:, :]
    npv = float(n_per_visit)

    # Output VMEM blocks start UNINITIALIZED — input/output aliasing is an
    # HBM-buffer property, not a VMEM-block one. Seed them before any RMW.
    ne_out[:, :, :] = ne_in[:, :, :]
    we_out[:, :, :] = we_in[:, :, :]

    def sel_of(t):
        return (node_iota == t[:, None]).astype(jnp.float32)

    def cond(carry):
        current, v, dn, dw = carry
        return (current >= 0).any()

    def body(carry):
        current, v, dn, dw = carry
        active = current >= 0
        sel = sel_of(jnp.maximum(current, 0)) * active[:, None].astype(jnp.float32)

        term = (TERM * sel).sum(-1)
        v = jnp.where(((term > 0.5) & active)[:, None], 0.0, v)
        rew = jnp.stack([(rew_ref[:, :, s] * sel).sum(-1) for s in range(S)], -1)
        v = v + jnp.where(active[:, None], rew, 0.0)

        dn = dn + sel * npv
        dw = dw + sel[:, :, None] * v[:, None, :]

        parent = (PAR * sel).sum(-1).astype(jnp.int32) + jnp.where(active, 0, -1)
        rel = (REL * sel).sum(-1).astype(jnp.int32)
        selp = sel_of(jnp.maximum(parent, 0))
        seat_p = (SEATS * selp).sum(-1).astype(jnp.int32)
        v_par = jnp.where(seat_p == 0, v[:, 0], v[:, S - 1])

        # scalar extraction must come from 32-bit vectors (Mosaic constraint);
        # updates are unconditional with a zero gate instead of pl.when —
        # predicated dynamic-sublane RMW miscompiles on current Mosaic
        active_i = active.astype(jnp.int32)
        for e in range(E):
            gate = jax.lax.select(
                (active_i[e] > 0) & (parent[e] >= 0), 1.0, 0.0
            )
            p = jnp.maximum(parent[e], 0)
            onehot = (lane == rel[e]).astype(jnp.float32) * gate
            ne_out[e, pl.ds(p, 1), :] = ne_out[e, pl.ds(p, 1), :] + onehot * npv
            we_out[e, pl.ds(p, 1), :] = we_out[e, pl.ds(p, 1), :] + onehot * v_par[e]

        current = jnp.where(active, parent, -1)
        return current, v, dn, dw

    leaf = leaves_ref[:, 0]
    v0 = vleaf_ref[:, :]
    dn0 = jnp.zeros((E, T), jnp.float32)
    dw0 = jnp.zeros((E, T, S), jnp.float32)
    _, _, dn, dw = jax.lax.while_loop(cond, body, (leaf, v0, dn0, dw0))

    n_out[:, :] = n_in[:, :] + dn
    w_out[:, :, :] = w_in[:, :, :] + dw


def backup_dense(tree, leaves, n_per_visit, block_envs=8, interpret=False, mesh=None, mesh_axis="dp"):
    """Dense-in-VMEM Pallas backup: all statistics updated inside the kernel
    with input/output aliasing; fastest inside the simulate scan (the delta
    variant pays two XLA scatters per sim)."""
    B, T, S = tree.w.shape
    A = tree.children.shape[-1]
    E = block_envs
    shards = mesh.shape[mesh_axis] if mesh is not None else 1
    assert (B // shards) % E == 0

    envs = jnp.arange(B)
    v0 = tree.v[envs, leaves]

    def inner(v0, leaves2, parents, relation, seats, term, rew, n, w, ne, we):
        Bl = v0.shape[0]
        grid = (Bl // E,)
        spec_ta = pl.BlockSpec((E, T, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        spec_ts = pl.BlockSpec((E, T, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        spec_t = pl.BlockSpec((E, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
        spec_s = pl.BlockSpec((E, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
        spec_1 = pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _backup_dense_kernel, E=E, T=T, A=A, S=S, n_per_visit=n_per_visit
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                spec_s, spec_1, spec_t, spec_t, spec_t, spec_t, spec_ts,
                spec_t, spec_ts, spec_ta, spec_ta,
            ],
            out_specs=[spec_t, spec_ts, spec_ta, spec_ta],
            out_shape=[
                jax.ShapeDtypeStruct((Bl, T), jnp.float32),
                jax.ShapeDtypeStruct((Bl, T, S), jnp.float32),
                jax.ShapeDtypeStruct((Bl, T, A), jnp.float32),
                jax.ShapeDtypeStruct((Bl, T, A), jnp.float32),
            ],
            input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
            interpret=interpret,
        )(v0, leaves2, parents, relation, seats, term, rew, n, w, ne, we)

    inner = _shardwrap(inner, mesh, mesh_axis, n_batch_args=11, n_rep_args=0, n_outs=4)
    n_new, w_new, ne_new, we_new = inner(
        v0.astype(jnp.float32),
        leaves.astype(jnp.int32)[:, None],
        tree.parents,
        tree.relation,
        tree.seats,
        tree.terminal.astype(jnp.float32),
        tree.rewards.astype(jnp.float32),
        tree.n.astype(jnp.float32),
        tree.w.astype(jnp.float32),
        tree.n_edge.astype(jnp.float32),
        tree.w_edge.astype(jnp.float32),
    )
    return tree.replace(
        n=jnp.round(n_new).astype(tree.n.dtype),
        w=w_new.astype(tree.w.dtype),
        n_edge=ne_new.astype(tree.n_edge.dtype),
        w_edge=we_new.astype(tree.w_edge.dtype),
    )
