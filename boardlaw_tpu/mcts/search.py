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

import math
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
    # Batched MCTS: expand K leaves per pass from ONE all-node solve + ONE
    # net eval over K*B leaf worlds. K=1 is exactly the reference's
    # sequential search; K>1 trades per-sim sequential information for
    # throughput (the K walks all sample from the same pre-pass stats, so a
    # pass's leaves are i.i.d. draws rather than virtual-loss-diversified;
    # duplicate draws of one unexpanded edge collapse to a single expansion
    # backed up once per draw). Tree capacity spends K slots per pass, so
    # n_nodes stays the node budget.
    leaves_per_pass: int = 1
    # multi-leaf (K>1) solve budget. Default: 6 COLD safeguarded-Halley
    # iterations — measured to satisfy the TWO-SIDED |err|<tol check on every
    # live node row (strictly stronger than the reference's one-sided check).
    # Warm-starting from the previous pass's alphas (warm_solve=True +
    # Tree.alpha) is kept as an option but is a measured net LOSS: each pass
    # moves the stats of every row on the K backup paths (root included), and
    # a stale alpha can sit just above a new q-pole where safeguarded steps
    # crawl — warm-3 leaves 20-40% of live rows |err|>=tol (max err ~8) and
    # even warm-10 is needed to match cold-6, while the unrolled loop pays
    # n_iters either way. solve_accel=False + solve_iters=16 + warm_solve=
    # False recovers the pure reference formulation. K=1 always runs the cold
    # 16-iteration Newton for bit-parity with the sequential reference search.
    solve_iters: int = 6
    solve_accel: bool = True
    warm_solve: bool = False
    # multi-leaf sampler prefix-sum formulation: 'matmul' = one triangular
    # (A,A) MXU contraction at HIGHEST precision + count-based lane
    # extraction (fastest measured); 'shift' = log-shift Hillis-Steele,
    # bit-identical to the Pallas sampler kernels (see
    # _sample_children_multi)
    sample_cum: str = "matmul"
    # Triangular passes: pass p of the multi-leaf search operates on a
    # sliced subtree of R_p = 1 + (p+1)*K rows instead of the full T — the
    # solve/sample/walk/backup streams shrink from rectangular (n_passes * T
    # rows) to triangular (sum R_p ~ T/2 on average), a ~2x bandwidth cut on
    # the node-wise stages. Distribution-identical to the scan path (same
    # ops over the same live rows; only the rand stream's shape differs).
    # Unrolls the pass loop (one compile per distinct R_p instead of one
    # scan body), so compiles are slower; the Pallas walk/sampler kernels
    # default OFF in this mode (8 Mosaic variants are not worth it — the
    # XLA walk caps at p+2 levels here).
    grow_passes: bool = False
    # Multi-leaf backup formulation. 'prefix' (default): maintain a per-node
    # cumulative-reward-from-root tensor (Tree.prew) so each path's value
    # contribution collapses to a per-path constant C_k minus a node-local
    # prefix — the backup then needs NO per-level one-hot contractions at
    # all, just (K,B,T)-shaped masks and two fused compare-accumulate
    # streams over the edge tensors (~roofline traffic). 'einsum' = the
    # round-4 formulation (path one-hots + suffix-sum matmuls), kept as the
    # executable spec the prefix path is tested against. K=1 always uses the
    # original per-path backup for bit-parity with the sequential reference.
    backup_mode: str = "prefix"
    # Multi-leaf leaf-row write routing. 'einsum' (default): the one-hot
    # contraction form. 'select': a chain of K masked selects per field —
    # bit-identical, but chip-measured ~5% SLOWER end-to-end (0.2335 vs
    # 0.2218s/search at K=8 16k envs, 0.1998 vs 0.1843 at K=16,
    # measure_round5.py): the K-deep select chain serializes VPU work along
    # K where the MXU contraction amortizes it. Kept as an A/B variant.
    write_mode: str = "einsum"
    # Multi-leaf parent-row world gather. 'einsum' (default): one-hot
    # contraction streaming each (B,T,F) leaf once for all K. 'take': a
    # batched take_along_axis of the K parent rows — bit-identical and a
    # measured 1.5x LOSS (0.3346 vs 0.2218s/search: the row gather lowers
    # to ~K full-tensor scans, as the _take_node note predicts). Kept as a
    # variant so the loss stays documented-by-measurement.
    gather_mode: str = "einsum"
    tree_dtype: object = jnp.float32  # storage dtype for logits
    # Compact tree bookkeeping: int8 child pointers (valid while n_nodes<=127)
    # and bf16 edge visit counts (exact while total visits<=256, i.e.
    # n_nodes<=128 even in the double-counting 'seats' mode). Saves ~0.85GB
    # at the 32k-env 9x9 flagship with BIT-IDENTICAL search results; auto
    # falls back to wide dtypes when the bounds don't hold.
    compact: bool = True
    # None = auto (on TPU), True/False to force, 'interpret' = Pallas kernels
    # in interpreter mode (runs on CPU — used to exercise the real multi-chip
    # shard_map+pallas path without TPU hardware)
    use_pallas: object = None
    pallas_block_envs: int = 32  # descend blocks
    # 'xla' (while-loop chase + one scatter, 6.3ms at 16k — fastest measured)
    # | 'dense' (in-VMEM edge deltas, 32ms) | 'delta'
    pallas_backup: str = "xla"
    pallas_backup_envs: int = 16  # backup blocks
    # the production descend = all-node Pallas solve/sample + XLA pointer
    # chase. None = auto (on on TPU), True/False force, 'interpret' = kernel
    # in interpreter mode (CPU shard_map testing)
    pallas_nodes: object = None
    pallas_nodes_envs: int = 16  # node_actions kernel env blocks
    # the all-node SOLVE kernel (multi-leaf cold path): flattened (rows, A)
    # blocks keep the whole Halley chain in VMEM — one HBM read of
    # logits/n_edge/w_edge and one probs write, where the XLA solve
    # re-streams the (B,T,A) intermediates every iteration.
    # None = auto, which is OFF: chip-measured SLOWER than the fused XLA
    # solve on the production grow path (see _pallas_solve_enabled).
    # True forces the probs-output kernel, "alpha" the roots-only variant
    # (best scan-mode option), "interpret"/"alpha_interpret" for CPU testing.
    pallas_solve: object = None
    pallas_solve_rows: int = 0  # 0 = auto (largest power-of-two divisor)
    # the K-sampler kernel (multi-leaf only): K inverse-CDF draws + child
    # lookups from one VMEM residency of the solved probs, replacing the XLA
    # sampler's ~K HBM re-reads. None = auto (on on TPU when env counts
    # divide), True/False force, 'interpret' for CPU testing
    pallas_sample: object = None
    pallas_sample_envs: int = 64  # sampler kernel env blocks
    # the pointer-chase walk kernel: None = auto (on on TPU when the env
    # count divides), True/False force, 'interpret' for CPU testing
    pallas_walk: object = None
    # Env block size. The current kernel chases pointers in a fixed-carry
    # while_loop holding a handful of (E,T) i32/bool carries, so VMEM stays
    # a few hundred KB even at E=256 (chip sweep: 256 ~5% over 64 at 16k
    # envs — fewer grid launches). The old T-level UNROLLED chase kept ~T
    # live (E,T) vectors and blew the 16MB scoped-VMEM stack at E=256
    # (measured 22.5M) — that constraint died with it.
    pallas_walk_envs: int = 256  # max block; clamped to a per-shard divisor
    mesh: object = None  # jax.sharding.Mesh — shard kernels via shard_map
    mesh_axis: str = "dp"


def _pallas_enabled(cfg, B):
    if cfg.use_pallas is not None:
        return bool(cfg.use_pallas)
    # auto = OFF: the vectorized `node_actions` descend + one-hot XLA backup
    # beat the VMEM-walk Pallas kernels on chip (23ms/26ms per sim at 16k
    # envs vs ~3ms/3ms — the kernels' per-env dynamic-sublane loops serialize
    # badly). The kernels remain available for comparison via use_pallas.
    return False


def _pallas_nodes_enabled(cfg, B):
    if cfg is None:
        return False
    if cfg.pallas_nodes is not None:
        return bool(cfg.pallas_nodes)
    # auto = ON on chip: the VMEM-resident kernel beats the XLA all-node
    # solve (~37ms vs ~61ms at 16k envs 9x9 — XLA round-trips the (B,T,A)
    # tensors through HBM on every Newton iteration because the lane
    # reductions break fusion; the kernel keeps them in VMEM).
    per_shard = B // (cfg.mesh.shape[cfg.mesh_axis] if cfg.mesh is not None else 1)
    return (
        jax.devices()[0].platform == "tpu"
        and per_shard % cfg.pallas_nodes_envs == 0
    )


def _pallas_solve_enabled(cfg):
    if cfg is None:
        return False
    if cfg.pallas_solve is not None:
        return bool(cfg.pallas_solve)
    # auto = OFF: chip-measured (scripts/measure_round4.py, 16k envs 9x9
    # K=8) the kernel only shaves the scan path 516->477ms (the 6-iteration
    # chain is VPU-bound on 81->128 padded lanes, ~22ms/pass vs XLA's 27.6)
    # and LOSES on the production grow path (295->404ms: materializing probs
    # to HBM breaks the XLA solve->sampler fusion on the triangular shapes).
    # The alpha-only variant (pallas_solve="alpha": kernel returns just the
    # (B,T) Newton roots, probs re-derived in XLA and fused into the sampler)
    # removes that round trip but STILL loses on grow (262->358ms at the same
    # shapes — the lane padding tax dominates at small R, and 8 per-R Mosaic
    # variants cost ~15min of remote compile); it is the best SCAN variant
    # (520->485ms). Kept as explicit variants (True/"alpha") and for
    # interpret-mode mesh tests.
    return False


def _pallas_sample_enabled(cfg, B):
    if cfg is None:
        return False
    if cfg.pallas_sample is not None:
        return bool(cfg.pallas_sample)
    # auto = OFF until chip-measured (Mosaic compiles of node-shaped kernels
    # run 10+ min remotely; enable explicitly via pallas_sample=True)
    return False


def _walk_block(cfg, rows):
    """Largest power-of-two block <= cfg.pallas_walk_envs dividing the
    per-shard row count (so raising the default block can never silently
    disable the kernel for small batches — it just shrinks the block)."""
    per_shard = rows // (cfg.mesh.shape[cfg.mesh_axis] if cfg.mesh is not None else 1)
    e = 1
    while e * 2 <= cfg.pallas_walk_envs and per_shard % (e * 2) == 0:
        e *= 2
    return e


def _pallas_walk_enabled(cfg, B):
    if cfg is None:
        return False
    if cfg.pallas_walk is not None:
        return bool(cfg.pallas_walk)
    return jax.devices()[0].platform == "tpu" and _walk_block(cfg, B) >= 8


def _pallas_kwargs(cfg):
    return {
        "interpret": cfg.use_pallas == "interpret",
        "mesh": cfg.mesh,
        "mesh_axis": cfg.mesh_axis,
    }


class Tree(struct.PyTreeNode):
    """The search tree for every env, as dense (B, T, ...) tensors.

    Same data model as the reference (mcts/__init__.py:43-70) — children /
    parents / relation topology, per-node worlds, transitions, decisions and
    visit statistics preallocated at T = n_nodes slots — plus one TPU-first
    addition: *edge* statistics. The reference keeps stats per node and
    gathers each child's (q, n) through the children pointers on every
    descend step (mcts/cpp/cuda.cu:80-92); per-element cross-tree gathers
    lower terribly on TPU. Because an edge (p, a) -> c is traversed exactly
    when c is on the backup path, `n_edge[b,p,a] == n[b,c]` and
    `w_edge[b,p,a] == w[b,c,seat(p)]` hold identically — so keeping them as
    dense (B,T,A) tensors updated during backup turns the descend hot path
    into pure row lookups with NO child indirection.
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
    n: jnp.ndarray  # (B,T) int32 visit counts per node
    w: jnp.ndarray  # (B,T,S) f32 value sums per node
    n_edge: jnp.ndarray  # (B,T,A) f32 — visits of each child, stored on the edge
    w_edge: jnp.ndarray  # (B,T,A) f32 — child value sums for the PARENT's seat
    c_puct: jnp.ndarray  # (B,) f32
    sim: jnp.ndarray  # () int32 — next free node slot
    # Cached per-node Newton solution alpha (B,T) f32 — warm-starting each
    # sim's solve from the previous sim's alpha cuts the iteration count ~2x
    # (stats change only along one backup path per sim). None = cold start
    # (tests building raw trees).
    alpha: object = None
    # Cumulative rewards root->node INCLUSIVE, (B,T,S) f32 — maintained
    # incrementally at expansion (prew[leaf] = prew[parent] + rewards) and
    # consumed by the 'prefix' backup (see MCTSConfig.backup_mode). None
    # when the einsum backup (or K=1) is in use.
    prew: object = None


def build(world, cfg: MCTSConfig):
    """Preallocate the tree with the root world in slot 0
    (reference mcts/__init__.py:29-70)."""
    B = world.n_envs
    K = cfg.leaves_per_pass
    # K>1 allocates K slots per pass: capacity covers every pass's slots
    T = cfg.n_nodes if K == 1 else 1 + K * (-(-(cfg.n_nodes - 1) // K))
    A = world.action_space.dim
    S = world.n_seats

    child_dtype = jnp.int8 if (cfg.compact and T <= 127) else jnp.int32
    count_dtype = jnp.bfloat16 if (cfg.compact and 2 * T <= 256) else jnp.float32

    worlds = jax.tree.map(lambda x: jnp.broadcast_to(x[:, None], (B, T) + x.shape[1:]), world)
    return Tree(
        children=jnp.full((B, T, A), -1, child_dtype),
        parents=jnp.full((B, T), -1, jnp.int32),
        relation=jnp.full((B, T), -1, jnp.int32),
        worlds=worlds,
        seats=jnp.broadcast_to(world.seats.astype(jnp.int32)[:, None], (B, T)),
        terminal=jnp.zeros((B, T), bool),
        rewards=jnp.zeros((B, T, S), jnp.float32),
        # NOTE: unlike the reference's NaN-poisoned init (mcts/__init__.py:55),
        # tree tensors must stay FINITE: row lookups are one-hot contractions
        # and 0 * inf = NaN would contaminate every lookup. -inf logits are
        # clamped to NEG_INF_PROXY on store (exp underflows to 0 identically).
        logits=jnp.zeros((B, T, A), cfg.tree_dtype),
        v=jnp.zeros((B, T, S), jnp.float32),
        n=jnp.zeros((B, T), jnp.int32),
        w=jnp.zeros((B, T, S), jnp.float32),
        n_edge=jnp.zeros((B, T, A), count_dtype),
        w_edge=jnp.zeros((B, T, A), jnp.float32),
        c_puct=jnp.full((B,), cfg.c_puct, jnp.float32),
        sim=jnp.array(0, jnp.int32),
        # warm-start slot for the multi-leaf solve: zeros always fail the
        # warm gate (0 <= floor), so the first pass runs the cold init
        alpha=(jnp.zeros((B, T), jnp.float32)
               if (K > 1 and cfg.warm_solve) else None),
        # root row: no ancestors, no own reward -> 0 (rewards[root] is never
        # written); only allocated when the prefix backup will consume it
        prew=(jnp.zeros((B, T, S), jnp.float32)
              if (K > 1 and cfg.backup_mode == "prefix") else None),
    )


# Finite stand-in for -inf inside tree tensors: exp(-1e4) underflows to 0 in
# f32/bf16, so masked actions behave identically to the reference's -inf.
NEG_INF_PROXY = -1e4


def _clamp_logits(logits):
    return jnp.maximum(logits, NEG_INF_PROXY)


def _unclamp_logits(logits):
    return jnp.where(logits <= NEG_INF_PROXY, -jnp.inf, logits)


def _log_gamma_fixed(key, a, shape, rounds=4):
    """log of a Gamma(a) draw via FIXED-round Marsaglia-Tsang rejection.

    `jax.random.gamma`'s rejection sampler is a `lax.while_loop`; on TPU that
    serializes an otherwise fully-fused elementwise program (traced at ~20ms
    per 16k-env root init). Instead we stack `rounds` independent proposals
    and keep the first accepted one. MT acceptance for shape a+1 is >0.95, so
    the chance NO round accepts is <1e-5 per variate; those fall back to the
    distribution mode d (bias ~1e-5 of exploration noise — irrelevant).
    Returned in log space so the a<1 power boost u**(1/a) can't underflow f32.
    """
    boost = a < 1.0
    ab = a + 1.0 if boost else float(a)
    d = ab - 1.0 / 3.0
    c = 1.0 / math.sqrt(9.0 * d)
    k_n, k_u, k_b = jax.random.split(key, 3)
    x = jax.random.normal(k_n, (rounds,) + shape)
    u = jax.random.uniform(k_u, (rounds,) + shape, minval=1e-20)
    v = (1.0 + c * x) ** 3
    logv = jnp.log(jnp.where(v > 0, v, 1.0))
    ok = (v > 0) & (jnp.log(u) < 0.5 * x * x + d - d * v + d * logv)
    # first accepted round (argmax of bool); rows with no accept get logv=0
    # there, i.e. the mode d
    idx = jnp.argmax(ok, axis=0)
    pick = lambda t: jnp.take_along_axis(t, idx[None], axis=0)[0]
    log_g = math.log(d) + jnp.where(ok.any(0), pick(logv), 0.0)
    if boost:
        log_u = jnp.log(jax.random.uniform(k_b, shape, minval=1e-20))
        log_g = log_g + log_u / a
    return log_g


def dirichlet_noise(key, logits, valid, eps, alpha_scale=10.0):
    """Mix a symmetric-Dirichlet draw over the valid actions into the root
    prior (reference mcts/__init__.py:13-24). The draw is normalized gammas
    sampled in log space with a fixed-round rejection (`_log_gamma_fixed`) —
    normalization is scale-invariant, so shifting by the row max before exp
    is exact and immune to underflow at small alpha."""
    A = logits.shape[-1]
    log_g = _log_gamma_fixed(key, alpha_scale / A, logits.shape)
    log_g = jnp.where(valid, log_g, -jnp.inf)
    draw = jnp.exp(log_g - jnp.max(log_g, -1, keepdims=True))
    draw = draw / draw.sum(-1, keepdims=True)
    probs = jnp.exp(logits.astype(jnp.float32)) * (1 - eps) + draw * eps
    return jnp.log(probs)


def initialize(tree, decisions, key, cfg: MCTSConfig, valid):
    """Seed the root with the network eval plus Dirichlet exploration noise
    (reference mcts/__init__.py:72-80)."""
    noised = dirichlet_noise(key, decisions["logits"], valid, cfg.noise_eps, cfg.alpha_scale)
    return tree.replace(
        logits=tree.logits.at[:, 0].set(_clamp_logits(noised).astype(tree.logits.dtype)),
        v=tree.v.at[:, 0].set(decisions["v"].astype(tree.v.dtype)),
        sim=jnp.array(1, jnp.int32),
    )


# --------------------------------------------------------------------------
# The regularized-policy solve
# --------------------------------------------------------------------------

def solve_policy(pi, q, lambda_n, tol=1e-3, n_iters=16, warm_alpha=None,
                 return_alpha=False, accel=False):
    """Solve pi_bar(a) = lambda_n*pi(a)/(alpha - q(a)) with alpha chosen by
    Newton iteration so sum_a pi_bar = 1, vectorized over envs.

    pi: (B,A) prior probs (0 at invalid actions); q: (B,A) in [0,1];
    lambda_n: (B,). Mirrors the per-thread shared-memory solve of
    mcts/cpp/cuda.cu:35-68 as (B,A) VPU math.

    TPU note: the iteration count is FIXED and unrolled (masked updates after
    convergence) rather than an early-exit `lax.while_loop`. Each while-loop
    trip is a separate latency-bound device step (~50us); unrolling lets XLA
    fuse the whole solve into one kernel. Typical problems converge in ~10
    Newton steps (the reference notes the same, cuda.cu:45-47), so 16 fused
    iterations is both faster and as accurate as the reference's up-to-100
    early-exit loop.

    `warm_alpha` (B,) restarts Newton from a previous solve of a slightly
    perturbed problem (the multi-leaf search re-solves every node each pass
    while only ~K paths' stats moved). Newton on this convex decreasing s
    converges monotonically from BELOW the root, so a stale alpha is kept
    only where it is still strictly below the new root (s(warm) > 1) and
    above the new floor; elsewhere it falls back to the cold init. Converged
    results satisfy the same one-sided `err < tol` criterion as the cold
    solve and the reference's early-exit loop — same tolerance contract,
    fewer iterations needed.

    `accel=True` switches to SAFEGUARDED-HALLEY steps with a TWO-SIDED
    |err| < tol done check — a strictly stronger contract than the
    reference's one-sided check. Each step is Newton times the Halley factor
    1/(1 - t), t = err*s''/(2 s'^2), applied only from BELOW the root
    (err > 0) and only while stable (t < 0.75, factor capped at 4x): the
    plain-Halley denominator flips sign when curvature dominates and would
    plunge alpha into the q-pole. Any overshoot lands on the far (pole-free)
    side and the next plain-Newton step walks back; the two-sided check
    never freezes an overshot row as 'done'. Measured: real multi-leaf trees
    converge on EVERY live row in 6 cold accelerated steps (vs ~10-16
    monotone Newton); a brutal synthetic sweep (lambda in [5e-4, 1e3],
    uniform q) also converges everywhere in 6 (vs 8 Newton). Warm-started
    rows whose stats moved since the cached solve can land just above a new
    q-pole and crawl (warm-3 leaves 20-40% of live rows |err|>=tol, warm-10
    is needed to match cold-6) — hence the cold default. K=1 keeps the
    bit-exact reference formulation.
    """
    lam = lambda_n[:, None].astype(jnp.float32)
    pi = pi.astype(jnp.float32)
    q = q.astype(jnp.float32)

    # hoist the numerator and use ONE reciprocal per iteration (terms/denom
    # twice costs two of the slowest VPU ops per element per iteration)
    lampi = lam * pi
    gap = jnp.maximum(lampi, 1e-4)
    alpha = jnp.max(q + gap, -1)
    floor = jnp.max(q, -1) + 1e-6  # keep alpha strictly above every q
    if warm_alpha is not None:
        warm_alpha = warm_alpha.astype(jnp.float32)
        s_w = (lampi / (warm_alpha[:, None] - q)).sum(-1)
        ok = (warm_alpha > floor) & (s_w > 1.0)
        alpha = jnp.where(ok, jnp.maximum(warm_alpha, alpha), alpha)
    done = jnp.zeros(alpha.shape, bool)

    for _ in range(n_iters):
        r = 1.0 / (alpha[:, None] - q)
        terms = lampi * r
        s = terms.sum(-1)
        g = -(terms * r).sum(-1)
        err = s - 1.0
        step = err / g
        if accel:
            done = done | (jnp.abs(err) < tol)
            h = 2.0 * (terms * r * r).sum(-1)
            t = err * h / (2.0 * g * g)
            ok = (err > 0) & (t < 0.75)
            step = jnp.where(ok, step / jnp.maximum(1.0 - t, 0.25), step)
        else:
            done = done | (err < tol)
        alpha = jnp.maximum(alpha - jnp.where(done, 0.0, step), floor)

    probs = lampi / (alpha[:, None] - q)
    return (probs, alpha) if return_alpha else probs


def _take_node(arr, t, dtype=None):
    """Per-env row lookup `arr[envs, t]` for (B, T, ...) tensors.

    TPU note: batched ROW gathers and scatters lower to full-tensor-bandwidth
    scans (~fine); what must never appear in the hot path is a per-ELEMENT
    gather with (B, A) index tensors (the reference's child q/n indirection,
    mcts/cpp/cuda.cu:80-92) — those are 30x slower. The edge-stat layout
    exists precisely so every hot lookup is a row lookup.
    """
    out = jnp.take_along_axis(arr, t.reshape((-1,) + (1,) * (arr.ndim - 1)), axis=1)
    out = out[:, 0]
    return out.astype(dtype) if dtype is not None else out


def _take_action(row, a):
    """Per-env element lookup `row[envs, a]` for a (B, A) tensor."""
    return jnp.take_along_axis(row, a[:, None], axis=1)[:, 0]


def _node_policy(tree, t, q_bounds):
    """pi_bar for node index t (B,) of every env.

    Semantics match mcts/cpp/cuda.cu:70-99 exactly — unexpanded children
    contribute q=0 and count 1 to N — but all inputs come from the dense edge
    tensors of this node's row: no child indirection at all.
    """
    B, T, A = tree.children.shape

    logits = _take_node(tree.logits, t)  # (B,A)
    n_edge = _take_node(tree.n_edge, t)  # (B,A)
    w_edge = _take_node(tree.w_edge, t)  # (B,A)

    lo, hi = q_bounds
    expanded = n_edge > 0
    q_raw = w_edge / (n_edge + 1e-4)
    q = jnp.where(expanded, (q_raw - lo) / (hi - lo + 1e-4), 0.0)
    counts = jnp.where(expanded, n_edge, 1.0)

    pi = jnp.exp(logits)
    N = counts.sum(-1)
    lambda_n = tree.c_puct * N / (N + A)
    return solve_policy(pi, q, lambda_n)


def _q_bounds(tree):
    """Global min/max of the per-(node, seat) q estimates, used to min-max
    normalise q to [0,1] exactly as the reference (mcts/cpp/cuda.cu:101-105)
    — computed over the *node* statistics for bit-parity with the reference's
    `transition_q`, then applied to the identical edge-held q values."""
    q = tree.w / (tree.n[..., None].astype(jnp.float32) + 1e-4)
    return q.min(), q.max()


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


def descend_reference(tree, rands):
    """Level-serial walk: sample from the solved pi_bar at each visited node
    (using the pre-drawn uniform rands (B,T), one per node as in
    cuda.cu:184-203), until hitting a terminal or unexpanded child.

    Kept as the executable spec for parity tests; `descend` below computes
    bit-identical results in one vectorized pass and is the production path.

    Returns (parents, actions): the node to expand from and the action taken.
    """
    B, T, A = tree.children.shape
    q_bounds = _q_bounds(tree)

    t0 = jnp.zeros((B,), jnp.int32)
    parent0 = jnp.zeros((B,), jnp.int32)
    action0 = jnp.full((B,), -1, jnp.int32)

    def active_of(t):
        return (t != -1) & ~_take_node(tree.terminal, jnp.clip(t, 0))

    def cond(carry):
        t, parent, action = carry
        return active_of(t).any()

    def body(carry):
        t, parent, action = carry
        active = active_of(t)
        safe_t = jnp.clip(t, 0)
        probs = _node_policy(tree, safe_t, q_bounds)
        a = _sample(probs, _take_node(rands, safe_t))
        child = _take_action(_take_node(tree.children, safe_t), a)
        parent = jnp.where(active, safe_t, parent)
        action = jnp.where(active, a, action)
        t = jnp.where(active, child, t)
        return t, parent, action

    _, parents, actions = jax.lax.while_loop(cond, body, (t0, parent0, action0))
    return parents, actions


def node_probs(tree, q_bounds, warm_alpha=None, n_iters=16, return_alpha=False,
               accel=False, fixed_alpha=None):
    """Solved pi_bar for EVERY node of every env in one fully-vectorized
    pass -> (B,T,A) f32. The Newton solve is the expensive part of descend;
    computing it per-node once lets K samples share one solve.

    `warm_alpha` (B,T): restart from the previous pass's converged alphas
    (see solve_policy) — the multi-leaf search threads them through
    `Tree.alpha`.

    `fixed_alpha` (B,T): SKIP the iteration entirely and evaluate
    probs = lam*pi/(alpha - q) at the given already-converged roots (the
    alpha-only Pallas solve kernel's output) — a single elementwise pass that
    XLA fuses into the downstream sampler."""
    B, T, A = tree.children.shape
    lo, hi = q_bounds

    logits = tree.logits.astype(jnp.float32)  # (B,T,A)
    ne = tree.n_edge.astype(jnp.float32)
    we = tree.w_edge.astype(jnp.float32)

    expanded = ne > 0
    q = jnp.where(expanded, (we / (ne + 1e-4) - lo) / (hi - lo + 1e-4), 0.0)
    counts = jnp.where(expanded, ne, 1.0)
    pi = jnp.exp(logits)
    N = counts.sum(-1)  # (B,T)
    lam = tree.c_puct[:, None] * N / (N + A)

    if fixed_alpha is not None:
        return (lam[:, :, None] * pi) / (fixed_alpha[:, :, None].astype(jnp.float32) - q)

    out = solve_policy(
        pi.reshape(B * T, A), q.reshape(B * T, A), lam.reshape(B * T),
        n_iters=n_iters, accel=accel,
        warm_alpha=None if warm_alpha is None else warm_alpha.reshape(B * T),
        return_alpha=return_alpha,
    )
    if return_alpha:
        probs, alpha = out
        return probs.reshape(B, T, A), alpha.reshape(B, T)
    return out.reshape(B, T, A)


def _sample_children(tree, probs, rands):
    """Sample an action per node from solved probs and look up its child
    pointer -> (actions (B,T) i32, child (B,T) i32)."""
    B, T, A = tree.children.shape
    actions = _sample(probs.reshape(B * T, A), rands.reshape(B * T)).reshape(B, T)
    # child pointer per node via one-hot contraction (stays inside the same
    # fused pass; a per-element gather would lower to a slow scatter-gather)
    onehot = jax.nn.one_hot(actions, A, dtype=jnp.float32)
    child = (tree.children.astype(jnp.float32) * onehot).sum(-1).astype(jnp.int32)
    return actions, child


def _sample_children_multi(tree, probs, rands, cum_mode="matmul"):
    """K samples per node from one solved probs (B,T,A) -> (acts (K,B,T),
    child (K,B,T)). Implements the reference's inverse-CDF draw with
    positive-probability fallback (mcts/cpp/cuda.cu:157-175), vectorized over
    all nodes and K draws. (Multi-leaf mode only — the K=1 parity path keeps
    `_sample`.)

    cum_mode='matmul' (default): the inclusive prefix sum is ONE triangular
    (B*T,A)x(A,A) contraction at Precision.HIGHEST — MXU work instead of
    log2(A) full HBM passes (the Hillis-Steele shifts alone measured
    ~15ms/pass at 16k envs 9x9). Each draw then extracts its lane as a
    COUNT, `a = clip(#\\{cum < r\\}, first_pos, last_pos)`: one fused
    compare+reduce per draw instead of mask/min-iota/select chains. The
    count formulation is exactly equivalent to "first positive-prob lane
    with cum >= r": count c is the first lane with cum[c] >= r, and a
    zero-prob lane there would force cum[c] == cum[c-1] < r — impossible
    except at c=0 with r==0, which the first_pos clamp restores. r beyond
    the total (float underflow) gives c == A, restored to last_pos —
    the reference's fallback.

    cum_mode='shift': the log-shift (Hillis-Steele) prefix sum + masked-iota
    min, bit-identical dataflow to the Pallas node_actions/sampler kernels —
    kept for kernel lockstep tests and as the formulation those kernels
    track.
    """
    K, B, T = rands.shape
    A = probs.shape[-1]
    if K == 1:  # keep K=1 bit-identical to the sequential path's _sample
        a, c = _sample_children(tree, probs, rands[0])
        return a[None], c[None]
    pos = probs > 0
    lane = jnp.arange(A)
    # masked-iota max instead of reverse+argmax: the lane reversal alone cost
    # ~13ms/pass at 16k envs (rev is a real data-movement op on TPU); this is
    # the same formulation the Pallas node_actions kernels use
    last_pos = jnp.max(jnp.where(pos, lane, -1), -1).astype(jnp.int32)  # (B,T)

    if cum_mode == "matmul":
        incl = (lane[:, None] <= lane[None, :]).astype(probs.dtype)
        cum = jnp.matmul(probs, incl, precision=jax.lax.Precision.HIGHEST)
        first_pos = jnp.min(jnp.where(pos, lane, A), -1).astype(jnp.int32)
        # all K counts from ONE stacked compare+reduce — a per-k loop emits K
        # reduce kernels that each re-read the (B,T,A) f32 cum tensor (545MB
        # at the 16k-env flagship); stacked, XLA reads it once per fusion
        # (chip-verified bit-identical to the loop, scripts/archive/micro_bench7.py)
        cnt = jnp.sum(cum[None] < rands[..., None], -1).astype(jnp.int32)
        acts = jnp.clip(cnt, first_pos[None], last_pos[None])  # (K,B,T)
        # child lookups stay per-draw compare+reduce over the int8 children
        # (8 re-reads of an int8 tensor are cheap; a materialized one-hot
        # contraction would re-read a (B,T,A) f32 copy per draw)
        hit = lane == acts[:, :, :, None]  # (K,B,T,A)
        childs = jnp.sum(jnp.where(hit, tree.children[None], 0), -1,
                         dtype=jnp.int32)
        return acts, childs

    cum = probs
    shift = 1
    while shift < A:
        cum = cum + jnp.pad(cum, ((0, 0), (0, 0), (shift, 0)))[:, :, :A]
        shift *= 2
    children_f = tree.children.astype(jnp.float32)
    BIG = jnp.int32(A + 1)

    acts, childs = [], []
    for k in range(K):
        ok = pos & (cum >= rands[k][:, :, None])
        first_ok = jnp.min(jnp.where(ok, lane, BIG), -1)
        a_k = jnp.where(first_ok < BIG, first_ok, last_pos).astype(jnp.int32)
        onehot = jax.nn.one_hot(a_k, A, dtype=jnp.float32)
        c_k = (children_f * onehot).sum(-1).astype(jnp.int32)
        acts.append(a_k)
        childs.append(c_k)
    return jnp.stack(acts), jnp.stack(childs)


def node_actions(tree, rands, q_bounds):
    """Solve pi_bar and sample an action for EVERY node of every env in one
    fully-vectorized pass -> (actions (B,T) int32, child (B,T) int32).

    Correct because the search uses one pre-drawn uniform per NODE
    (rands[b,t], reference mcts/cpp/cuda.cu:184-203): a node's sampled action
    doesn't depend on where the walk is, so all T solves can run in parallel.
    This turns the descend hot path from a level-serial walk (the reference's
    per-thread loop / our Pallas VMEM walk) into one bandwidth-bound (B,T,A)
    elementwise pass that XLA fuses end-to-end — TPU-first reformulation.
    """
    return _sample_children(tree, node_probs(tree, q_bounds), rands)


def _take_scalar(arr, t):
    """Per-env scalar lookup arr[envs, t] on a (B, T) tensor — B-element
    gather, cheap at any batch size."""
    return jnp.take_along_axis(arr, t[:, None], axis=1)[:, 0]


def _node_actions_any(tree, rands, cfg):
    """acts/nxt for every node via the XLA all-node pass, or the Pallas VMEM
    twin when cfg enables it."""
    B = tree.children.shape[0]
    if _pallas_nodes_enabled(cfg, B):
        from . import pallas_kernels

        return pallas_kernels.node_actions(
            tree, rands, _q_bounds(tree),
            block_envs=cfg.pallas_nodes_envs,
            interpret=cfg.pallas_nodes == "interpret",
            mesh=cfg.mesh, mesh_axis=cfg.mesh_axis,
        )
    return node_actions(tree, rands, _q_bounds(tree))


def _halt_of(tree, nxt):
    """halt[b,t]: the walk stops AT node t — its sampled child is unexpanded
    (expand it) or terminal (back up from it). One (B,T) gather per sim, done
    once so the walk itself needs no per-level gathers at all."""
    term_child = jnp.take_along_axis(tree.terminal, jnp.clip(nxt, 0), axis=1)
    return (nxt == -1) | term_child


def _walk(acts, nxt, halt, root_terminal, max_levels=None):
    """Root->leaf pointer chase, UNROLLED over levels with one-hot lookups.

    TPU note: a `lax.while_loop` chase costs ~0.6ms/trip here — each trip's
    per-env element gathers lower to serialized scatter-gathers, and the trip
    count is the max depth over all envs. Node slots are allocated in
    simulation order, so node ids STRICTLY INCREASE along any root->leaf path
    — the walk is bounded by T levels and can be fully unrolled, with each
    level three masked (B,T) reductions. `max_levels` caps the unroll when
    the caller knows a tighter depth bound (multi-leaf trees grow <=1 level
    per pass, so n_passes+1 covers every walk — ~T/L fewer level iterations).

    Returns (parents, actions, halt_child, path) where path (B,L) int32 holds
    the visited node per level (-1 past the halting depth) — reused by
    `backup_path`, so descend and backup walk the tree ONCE per sim
    (reference walks it twice: cuda.cu:138-182 then :205-236). Path levels
    form a contiguous prefix per env: path[b,l] >= 0 iff l <= depth(b).
    """
    B, T = acts.shape
    L = T if max_levels is None else min(T, max_levels)
    iota = jnp.arange(T)[None, :]

    t = jnp.zeros((B,), jnp.int32)
    active = ~root_terminal
    parents = jnp.zeros((B,), jnp.int32)
    actions = jnp.full((B,), -1, jnp.int32)
    halt_child = jnp.full((B,), -1, jnp.int32)
    levels = []

    for _ in range(L):
        onehot = (iota == t[:, None]) & active[:, None]  # (B,T)
        a_t = jnp.where(onehot, acts, 0).sum(1)
        c_t = jnp.where(onehot, nxt, 0).sum(1)
        h_t = (onehot & halt).any(1)
        parents = jnp.where(active, t, parents)
        actions = jnp.where(active, a_t, actions)
        levels.append(jnp.where(active, t, -1))
        newly = active & h_t
        halt_child = jnp.where(newly, c_t, halt_child)
        active = active & ~h_t
        t = jnp.where(active, c_t, t)

    path = jnp.stack(levels, axis=1)  # (B,L)
    return parents, actions, halt_child, path


def _walk_flat(terminal, acts, nxt, cfg, max_levels=None, pad_to=None):
    """The pointer chase on flat (B',T) arrays (Pallas kernel when cfg
    enables it, else the XLA unrolled walk) -> (parents, actions, halt_child,
    path). Rows are independent: multi-leaf callers fold K into B'. The path
    record has min(T, max_levels) levels on the XLA route, >= T on the kernel
    route (callers truncate).

    `pad_to`: pad the node axis to this width before calling the Pallas
    kernel. The grow-passes mode slices the tree to R_p rows per pass — 8
    distinct Mosaic walk variants per search (one crashed the remote compiler
    outright, round-3 campaign); padding acts/nxt with halting values keeps
    ONE kernel shape for every pass (the walk starts at node 0 and pointers
    only reach rows < R, so the pad is never read — ~0.1ms of extra DMA vs a
    10-min compile per variant). The XLA route ignores it (its unroll is
    already level-capped)."""
    B = acts.shape[0]
    if _pallas_walk_enabled(cfg, B):
        from . import pallas_kernels

        E = _walk_block(cfg, B)
        if E < 8 and cfg.pallas_walk not in (None, "interpret"):
            # forced-on with a per-shard row count whose 2-adic part is tiny:
            # degenerate 1-4 row Mosaic blocks would either fail sublane
            # tiling or run absurdly slow — fail loudly instead (the auto
            # path already gates on E >= 8; interpret mode is emulation and
            # runs any block size)
            raise ValueError(
                f"pallas_walk=True needs a per-shard row count divisible by "
                f"a block of >=8 envs (got {B} rows -> block {E}); pad the "
                f"batch or set pallas_walk=False")
        T = acts.shape[1]
        if pad_to is not None and pad_to > T:
            pad = ((0, 0), (0, pad_to - T))
            acts = jnp.pad(acts, pad)
            nxt = jnp.pad(nxt, pad, constant_values=-1)
            terminal = jnp.pad(terminal, pad, constant_values=True)
        return pallas_kernels.walk(
            terminal, acts, nxt,
            block_envs=E,
            interpret=cfg.pallas_walk == "interpret",
            mesh=cfg.mesh, mesh_axis=cfg.mesh_axis,
        )
    term_child = jnp.take_along_axis(terminal, jnp.clip(nxt, 0), axis=1)
    halt = (nxt == -1) | term_child
    return _walk(acts, nxt, halt, terminal[:, 0], max_levels=max_levels)


def _walk_any(tree, acts, nxt, cfg):
    """The pointer chase (Pallas kernel when cfg enables it, else the XLA
    unrolled walk) -> (parents, actions, halt_child, path)."""
    return _walk_flat(tree.terminal, acts, nxt, cfg)


def descend(tree, rands, cfg=None):
    """Walk each env's tree from the root until hitting a terminal or
    unexpanded child. Same contract and bit-identical results as
    `descend_reference`, but all per-node math is precomputed by
    `node_actions` and the chase is the unrolled one-hot `_walk` (or its
    Pallas twin).

    Returns (parents, actions): the node to expand from and the action taken.
    """
    acts, nxt = _node_actions_any(tree, rands, cfg)
    parents, actions, _, _ = _walk_any(tree, acts, nxt, cfg)
    return parents, actions


def backup(tree, leaves, n_per_visit):
    """Propagate the leaf value to the root, zeroing at terminal nodes and
    accumulating per-node rewards (reference mcts/cpp/cuda.cu:205-236), and
    mirror each child's (n, w[parent-seat]) onto its parent edge so descend
    needs no child indirection.

    n_per_visit: how much each visit adds to n — n_seats replicates the
    reference's per-seat increment (see module docstring), 1 is the fix.

    TPU note: the walk only accumulates small (B,T)-sized node deltas; the
    big (B,T,A) edge tensors are updated ONCE afterwards, because an edge's
    stats are exactly its child node's stats routed through (parents,
    relation): n_edge[b, p(c), rel(c)] += dn[b, c], and similarly for w at
    the parent's seat. That keeps the per-level loop off the big tensors.
    """
    B, T, S = tree.w.shape
    A = tree.children.shape[-1]
    envs = jnp.arange(B)

    v0 = _take_node(tree.v, leaves)  # (B,S)
    current0 = leaves.astype(jnp.int32)
    dn0 = jnp.zeros((B, T), jnp.float32)
    dw0 = jnp.zeros((B, T, S), jnp.float32)

    def cond(carry):
        _, current, _, _ = carry
        return (current != -1).any()

    def body(carry):
        v, current, dn, dw = carry
        active = current != -1
        safe = jnp.clip(current, 0)

        term = _take_node(tree.terminal, safe)
        v = jnp.where((term & active)[:, None], 0.0, v)
        v = v + jnp.where(active[:, None], _take_node(tree.rewards, safe), 0.0)

        onehot_c = jax.nn.one_hot(safe, T, dtype=jnp.float32) * active[:, None]
        dn = dn + onehot_c * n_per_visit
        dw = dw + onehot_c[:, :, None] * v[:, None, :]

        parent = _take_node(tree.parents, safe)
        current = jnp.where(active, parent, -1)
        return v, current, dn, dw

    _, _, dn, dw = jax.lax.while_loop(cond, body, (v0, current0, dn0, dw0))
    return _apply_deltas(tree, dn, dw)


def _apply_deltas(tree, dn, dw):
    """Fold the per-node (dn, dw) visit deltas into the node stats and route
    them onto the parent edges (one scatter-add per edge tensor)."""
    B, T, S = tree.w.shape
    envs = jnp.arange(B)

    has_edge = tree.parents >= 0  # (B,T)
    safe_p = jnp.clip(tree.parents, 0)
    safe_r = jnp.clip(tree.relation, 0)
    seat_p = jnp.take_along_axis(tree.seats, safe_p, axis=1)  # (B,T)
    dw_parent = jnp.take_along_axis(
        dw, jnp.clip(seat_p, 0, S - 1)[..., None], axis=2
    )[..., 0]

    b_idx = jnp.broadcast_to(envs[:, None], (B, T))
    n_edge = tree.n_edge.at[b_idx, safe_p, safe_r].add(
        jnp.where(has_edge, dn, 0.0).astype(tree.n_edge.dtype)
    )
    w_edge = tree.w_edge.at[b_idx, safe_p, safe_r].add(
        jnp.where(has_edge, dw_parent, 0.0).astype(tree.w_edge.dtype)
    )

    return tree.replace(
        n=tree.n + jnp.round(dn).astype(tree.n.dtype),
        w=tree.w + dw,
        n_edge=n_edge,
        w_edge=w_edge,
    )


def _path_deltas(tree, path, acts, leaves, n_per_visit):
    """The (dn, dw, d_ne, d_we) stat deltas from backing up one recorded
    root->leaf path per env — the einsum core of `backup_path`."""
    B, T, S = tree.w.shape
    A = tree.children.shape[-1]
    Laug = T + 1  # path levels plus the leaf slot

    # augment the path with the leaf at position depth(b) (path levels are a
    # contiguous prefix, so parent/child pairs stay adjacent)
    depth = (path >= 0).sum(1)  # (B,)
    iota_l = jnp.arange(Laug)[None, :]
    leaf_pos = iota_l == depth[:, None]  # (B,Laug)
    path_aug = jnp.concatenate([path, jnp.full((B, 1), -1, path.dtype)], axis=1)
    path_aug = jnp.where(leaf_pos, leaves[:, None], path_aug)
    active = path_aug >= 0  # (B,Laug)

    onehotP = (
        jax.nn.one_hot(jnp.clip(path_aug, 0), T, dtype=jnp.bfloat16)
        * active[:, :, None]
    )  # (B,Laug,T)

    # path-compact lookups (one MXU matmul each; values are small integers /
    # +-1 rewards, exact in bf16)
    f32 = jnp.float32
    term_path = (
        jnp.einsum("blt,bt->bl", onehotP, tree.terminal.astype(f32),
                   preferred_element_type=f32) > 0.5
    )
    rew_path = jnp.einsum("blt,bts->bls", onehotP, tree.rewards.astype(f32),
                          preferred_element_type=f32)
    seat_path = jnp.einsum("blt,bt->bl", onehotP, tree.seats.astype(f32),
                           preferred_element_type=f32).astype(jnp.int32)
    a_path = jnp.einsum("blt,bt->bl", onehotP, acts.astype(f32),
                        preferred_element_type=f32).astype(jnp.int32)

    # leaf->root values: INTERIOR path nodes are never terminal (the walk
    # only descends into non-terminal children; a terminal child becomes the
    # leaf), so the recursion "v = (terminal ? 0 : v) + rew" collapses to a
    # suffix sum of rewards over the path plus the leaf's (zeroed-if-terminal)
    # value — one reverse cumsum instead of a per-level loop (a Laug-way
    # jnp.stack of lane-padded (B,S) tiles cost ~20ms/pass on chip).
    v = _take_node(tree.v, leaves).astype(f32)  # (B,S)
    leaf_term = jnp.einsum("bl,bl->b", term_path.astype(f32), leaf_pos.astype(f32)) > 0.5
    base = jnp.where(leaf_term[:, None], 0.0, v)  # (B,S)
    suffix = _suffix_sum_levels(rew_path)  # (B,Laug,S)
    dw_path = (suffix + base[:, None, :]) * active[:, :, None]  # (B,Laug,S)
    dn_path = active.astype(f32) * n_per_visit  # (B,Laug)

    # node deltas (value-carrying contractions run at HIGHEST precision)
    hi = jax.lax.Precision.HIGHEST
    dn = jnp.einsum("bl,blt->bt", dn_path, onehotP, preferred_element_type=f32)
    dw = jnp.einsum("bls,blt->bts", dw_path, onehotP,
                    preferred_element_type=f32, precision=hi)

    # edge deltas: parent position l feeds edge (path[l], a_path[l]) with the
    # child's (position l+1) visit count and parent-seat value
    child_active = active[:, 1:]  # (B,T) — position l+1 active
    onehotA = (
        jax.nn.one_hot(jnp.clip(a_path[:, :T], 0), A, dtype=jnp.bfloat16)
        * child_active[:, :, None]
    )  # (B,T,A) over parent positions
    seat_oh = jax.nn.one_hot(jnp.clip(seat_path[:, :T], 0, S - 1), S, dtype=f32)
    we_coef = (dw_path[:, 1:, :] * seat_oh).sum(-1)  # (B,T) child value @ parent seat
    ne_coef = child_active.astype(f32) * n_per_visit

    onehotP_par = onehotP[:, :T, :]  # (B,T,T) parent positions
    d_ne = jnp.einsum("blt,bla->bta", onehotP_par, onehotA * ne_coef[..., None].astype(jnp.bfloat16),
                      preferred_element_type=f32)
    d_we = jnp.einsum("blt,bla->bta", onehotP_par,
                      onehotA.astype(f32) * we_coef[..., None],
                      preferred_element_type=f32, precision=hi)

    return dn, dw, d_ne, d_we


def _apply_path_deltas(tree, dn, dw, d_ne, d_we):
    return tree.replace(
        n=tree.n + jnp.round(dn).astype(tree.n.dtype),
        w=tree.w + dw,
        n_edge=tree.n_edge + d_ne.astype(tree.n_edge.dtype),
        w_edge=tree.w_edge + d_we.astype(tree.w_edge.dtype),
    )


def backup_path(tree, path, acts, leaves, n_per_visit):
    """`backup`, but along the path RECORDED by `_walk` instead of re-chasing
    parent pointers — same results (n/n_edge exact; w/w_edge to f32 roundoff
    from the different summation order), no while_loop, no scatters.

    TPU formulation: every per-level lookup (terminal / rewards / seats /
    actions along the path) is ONE batched one-hot matmul on the MXU; the
    leaf->root value recursion then runs on compact (B, S) tensors — a pure
    elementwise chain XLA fuses into a single kernel (a dense (B,T)-wide
    per-level loop lowers to ~2ms/level of unfused reduction kernels; this
    whole function is a handful of einsums). The edge routing contracts the
    path one-hots directly: d_edge[b,t,a] = sum_l onehotP[b,l,t] *
    onehotA[b,l,a] * coef[b,l] — one batched matmul instead of the 12ms
    (B,T)-indexed scatter-add.
    """
    return _apply_path_deltas(tree, *_path_deltas(tree, path, acts, leaves, n_per_visit))


def _suffix_sum_levels(x):
    """Suffix (reverse-inclusive) sum along axis 1 via a triangular matmul —
    jnp.cumsum lowers to a serial reduce-window on the TPU (11ms/pass
    measured); an (L,L) ones-triangle contraction is one sub-ms MXU op.
    Exact to f32 roundoff (precision=HIGHEST)."""
    L = x.shape[1]
    tri = jnp.tril(jnp.ones((L, L), jnp.float32))  # tri[l, j] = 1 for j <= l
    # suffix[l] = sum_{j >= l} x[j] = sum_j tri[j, l] * x[j]
    return jnp.einsum("bls,lj->bjs", x, tri, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def backup_paths(tree, paths, acts, leaves, n_per_visit):
    """Back up K recorded paths per env in one update (the multi-leaf pass of
    `simulate_multi`). paths (K,B,L), acts (K,B,T), leaves (K,B). Each path's
    deltas come from the SAME pre-pass tree stats and sum into one replace
    (shared ancestors accumulate all K visits, as K sequential backups
    would).

    TPU formulation: the K paths CONCATENATE along the level axis — every
    lookup/delta einsum of `_path_deltas` runs once with K*(L+1) levels
    instead of K times (a per-k Python loop cost 82ms/pass in small fusions;
    the fused contractions are a handful of large MXU matmuls). The suffix
    value recursion runs on the (K*B, Laug, S) fold so sums never cross a
    path boundary.

    L may be far smaller than T: tree depth grows at most 1 per pass (all K
    walks see the same pre-pass tree), so `simulate_multi` truncates the
    walk's (B,T) path record to n_passes+1 levels — the backup one-hots and
    delta contractions shrink by T/L (~6x for the 64-node K=8 config).
    """
    K, B, L = paths.shape
    S = tree.w.shape[-1]
    A = tree.children.shape[-1]
    T = tree.terminal.shape[-1]
    Laug = L + 1
    f32 = jnp.float32

    # augment each path with its leaf at position depth(k,b)
    depth = (paths >= 0).sum(-1)  # (K,B)
    iota_l = jnp.arange(Laug)[None, None, :]
    leaf_pos = iota_l == depth[:, :, None]  # (K,B,Laug)
    path_aug = jnp.concatenate([paths, jnp.full((K, B, 1), -1, paths.dtype)], axis=-1)
    path_aug = jnp.where(leaf_pos, leaves[:, :, None], path_aug)
    active = path_aug >= 0  # (K,B,Laug)

    # concatenated-level one-hots: ONE (B, K*Laug, T) tensor serves all K
    def cat(x):  # (K,B,L,...) -> (B,K*L,...)
        return jnp.moveaxis(x, 0, 1).reshape((B, K * x.shape[2]) + x.shape[3:])

    aP = jax.nn.one_hot(jnp.clip(path_aug, 0), T, dtype=jnp.bfloat16) \
        * active[:, :, :, None]  # (K,B,Laug,T)
    onehotP = cat(aP)  # (B, K*Laug, T)

    term_path = (
        jnp.einsum("blt,bt->bl", onehotP, tree.terminal.astype(f32),
                   preferred_element_type=f32) > 0.5
    )  # (B, K*Laug)
    rew_path = jnp.einsum("blt,bts->bls", onehotP, tree.rewards.astype(f32),
                          preferred_element_type=f32)
    seat_path = jnp.einsum("blt,bt->bl", onehotP, tree.seats.astype(f32),
                           preferred_element_type=f32).astype(jnp.int32)
    # the action at each path level = that level's node row of the per-k acts
    a_lvl = jnp.einsum("kblt,kbt->kbl", aP, acts.astype(f32),
                       preferred_element_type=f32).astype(jnp.int32)  # (K,B,Laug)

    # leaf values, zeroed at terminal leaves; suffix-sum of rewards per path
    v = jnp.einsum("kbt,bts->kbs", jax.nn.one_hot(leaves, T, dtype=jnp.bfloat16),
                   tree.v.astype(f32), preferred_element_type=f32)  # (K,B,S)
    term_kbl = jnp.moveaxis(term_path.reshape(B, K, Laug), 1, 0)  # (K,B,Laug)
    leaf_term = (term_kbl & leaf_pos).any(-1)  # (K,B)
    base = jnp.where(leaf_term[:, :, None], 0.0, v)  # (K,B,S)
    rew_kbl = jnp.moveaxis(rew_path.reshape(B, K, Laug, S), 1, 0)  # (K,B,Laug,S)
    suffix = _suffix_sum_levels(rew_kbl.reshape(K * B, Laug, S)).reshape(K, B, Laug, S)
    dw_path = (suffix + base[:, :, None, :]) * active[..., None]  # (K,B,Laug,S)
    dn_path = cat(active).astype(f32) * n_per_visit  # (B,K*Laug)

    hi = jax.lax.Precision.HIGHEST
    dn = jnp.einsum("bl,blt->bt", dn_path, onehotP, preferred_element_type=f32)
    dw = jnp.einsum("bls,blt->bts", cat(dw_path), onehotP,
                    preferred_element_type=f32, precision=hi)

    # edge deltas over parent positions: drop each path's last level (leaf),
    # child coefficients come from level l+1
    onehotP_par = cat(aP[:, :, :L, :])  # (B,K*L,T)
    child_active = active[:, :, 1:]  # (K,B,L)
    onehotA = (
        jax.nn.one_hot(jnp.clip(cat(a_lvl[:, :, :L]), 0), A, dtype=jnp.bfloat16)
        * cat(child_active)[:, :, None]
    )  # (B,K*L,A)
    seat_oh = jax.nn.one_hot(
        jnp.clip(jnp.moveaxis(seat_path.reshape(B, K, Laug), 1, 0)[:, :, :L], 0, S - 1),
        S, dtype=f32)  # (K,B,L,S)
    we_coef = (dw_path[:, :, 1:, :] * seat_oh).sum(-1)  # (K,B,L)
    ne_coef = child_active.astype(f32) * n_per_visit  # (K,B,L)

    # d_ne accumulates integer visit deltas <= K*n_per_visit per edge —
    # exact in bf16, and the bf16 output halves the (B,T,A) materialization
    d_ne = jnp.einsum("blt,bla->bta", onehotP_par,
                      onehotA * cat(ne_coef)[..., None].astype(jnp.bfloat16),
                      preferred_element_type=jnp.bfloat16)
    d_we = jnp.einsum("blt,bla->bta", onehotP_par,
                      onehotA.astype(f32) * cat(we_coef)[..., None],
                      preferred_element_type=f32, precision=hi)

    return _apply_path_deltas(tree, dn, dw, d_ne, d_we)


def backup_paths_prefix(tree, paths, acts, leaves, n_per_visit):
    """`backup_paths` via the cumulative-reward prefix identity — same
    results (n/n_edge exact; w/w_edge to f32 roundoff from the different
    summation order), at ~roofline memory traffic.

    With P[t] = cumulative rewards root->t inclusive (Tree.prew, maintained
    at expansion) and interior path nodes never terminal (the walk only
    descends into non-terminal children), the leaf->root value recursion
    collapses: the backed-up value AT path node t is

        V_k(t) = C_k - (P[t] - rew[t]),   C_k = base_k + P[leaf_k]

    where base_k is the leaf value (0 if the leaf is terminal) — a per-PATH
    constant minus a node-LOCAL prefix. Level indices drop out entirely, so
    the backup needs none of the (B, K*L, T) path one-hots or suffix-sum
    matmuls of `backup_paths`:

      dn[t]      = npv * #{k : t on path k or leaf_k = t}
      dw[t]      = sum_k aug_k(t) * C_k  -  cnt(t) * (P[t] - rew[t])
      d_ne[t,a]  = npv * sum_k on_path_k(t) * [acts[k,t] = a]
      d_we[t,a]  = sum_k on_path_k(t) * [acts[k,t] = a] * (C_k - P[t])[seat(t)]

    (the edge value uses P INCLUSIVE of the parent because the child's
    exclusive prefix equals the parent's inclusive one). Each output is one
    fused compare-accumulate over the small (K,B,T) operands — acts, path
    masks and per-path constants — streamed once, broadcast along the lane
    axis for free; the big (B,T,A) edge tensors are read+written once by the
    += apply. Chip-measured TODO(r5 bench).
    """
    K, B, L = paths.shape
    T = tree.terminal.shape[-1]
    A = tree.children.shape[-1]
    S = tree.w.shape[-1]
    f32 = jnp.float32

    iota_t = jnp.arange(T)
    # interior path membership (root..parent; `_walk` never records the leaf)
    on_path = (paths[:, :, :, None] == iota_t).any(2)  # (K,B,T)
    # every draw contributes a leaf visit — dedup'd draws share a slot and
    # stack up, exactly as K sequential backups would
    oh_leaf = jax.nn.one_hot(leaves, T, dtype=f32)  # (K,B,T)

    prew = tree.prew.astype(f32)  # (B,T,S)
    # per-path constants from the POST-write tree (new leaves' v/rewards/
    # terminal/prew rows were written by this pass)
    v_leaf = jnp.einsum("kbt,bts->kbs", oh_leaf, tree.v.astype(f32),
                        preferred_element_type=f32)
    p_leaf = jnp.einsum("kbt,bts->kbs", oh_leaf, prew,
                        preferred_element_type=f32)
    term_leaf = jnp.einsum("kbt,bt->kb", oh_leaf, tree.terminal.astype(f32),
                           preferred_element_type=f32) > 0.5
    C = jnp.where(term_leaf[:, :, None], 0.0, v_leaf) + p_leaf  # (K,B,S)

    onf = on_path.astype(f32)
    aug = onf + oh_leaf  # (K,B,T) path-or-leaf multiplicity (0/1 per k)
    cnt = aug.sum(0)  # (B,T)
    dn = cnt * n_per_visit

    pex = prew - tree.rewards.astype(f32)  # strict-ancestor prefix (B,T,S)
    sumC = (aug[:, :, :, None] * C[:, :, None, :]).sum(0)  # (B,T,S)
    dw = sumC - cnt[:, :, None] * pex

    # edge coefficients at the parent's seat
    seat_oh = jax.nn.one_hot(jnp.clip(tree.seats, 0, S - 1), S, dtype=f32)
    Cs = (C[:, :, None, :] * seat_oh[None]).sum(-1)  # (K,B,T)
    Ps = (prew * seat_oh).sum(-1)  # (B,T)
    coefw = Cs - Ps[None]  # (K,B,T)

    # fused compare-accumulate: acts/on_path/coefw broadcast along the lane
    # axis inside the fusion — no (K,B,T,A) materialization
    hit = on_path[:, :, :, None] & (acts[:, :, :, None] == jnp.arange(A))
    d_ne = jnp.sum(jnp.where(hit, jnp.float32(n_per_visit), 0.0), axis=0)
    d_we = jnp.sum(jnp.where(hit, coefw[:, :, :, None], 0.0), axis=0)

    return _apply_path_deltas(tree, dn, dw, d_ne, d_we)


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
    path = acts = None
    if _pallas_enabled(cfg, B):
        from . import pallas_kernels

        parents, actions = pallas_kernels.descend(
            tree, rands, block_envs=cfg.pallas_block_envs, **_pallas_kwargs(cfg)
        )
        # Reuse the existing child slot if this (parent, action) edge was
        # already expanded (terminal transitions stop descents early) — else
        # allocate slot `sim` (mcts/__init__.py:115-122).
        existing = _take_action(_take_node(tree.children, parents), actions).astype(jnp.int32)
    else:
        acts, nxt = _node_actions_any(tree, rands, cfg)
        parents, actions, existing, path = _walk_any(tree, acts, nxt, cfg)
    leaves = jnp.where(existing == -1, tree.sim, existing).astype(jnp.int32)

    # TPU note: all row writes below are one-hot BLENDS, not .at[] scatters —
    # a per-env varying-row scatter on a (B,T,A) tensor lowers ~10x worse
    # than a masked select that streams the tensor once (measured in
    # scripts/bisect_simulate.py; XLA strength-reduces constant-index
    # scatters but not varying ones).
    iota_t = jnp.arange(T)[None, :]
    oh_leaf = iota_t == leaves[:, None]  # (B,T)
    oh_parent = iota_t == parents[:, None]  # (B,T)
    oh_act = jnp.arange(A)[None, :] == actions[:, None]  # (B,A)

    def set_row(full, new, oh=oh_leaf):
        # full (B,T,...) <- new (B,...) at the one-hot row
        mask = oh.reshape(oh.shape + (1,) * (full.ndim - 2))
        return jnp.where(mask, new[:, None].astype(full.dtype), full)

    children = jnp.where(
        oh_parent[:, :, None] & oh_act[:, None, :],
        leaves[:, None, None].astype(tree.children.dtype),
        tree.children,
    )

    old_world = jax.tree.map(
        lambda x: _take_node(x, parents, dtype=x.dtype), tree.worlds
    )
    world, transition = old_world.step(actions)

    decisions = eval_fn(world, k_eval)

    tree = tree.replace(
        children=children,
        parents=set_row(tree.parents, parents),
        relation=set_row(tree.relation, actions),
        worlds=jax.tree.map(lambda full, new: set_row(full, new), tree.worlds, world),
        seats=set_row(tree.seats, world.seats.astype(jnp.int32)),
        terminal=set_row(tree.terminal, transition.terminal),
        rewards=set_row(tree.rewards, transition.rewards),
        logits=set_row(tree.logits, _clamp_logits(decisions["logits"])),
        v=set_row(tree.v, decisions["v"]),
        sim=tree.sim + 1,
    )

    n_per_visit = tree.w.shape[-1] if cfg.backup_n == "seats" else 1
    if _pallas_enabled(cfg, B) and cfg.pallas_backup != "xla":
        from . import pallas_kernels

        fn = (
            pallas_kernels.backup_dense
            if cfg.pallas_backup == "dense"
            else pallas_kernels.backup
        )
        return fn(
            tree, leaves, n_per_visit,
            block_envs=cfg.pallas_backup_envs, **_pallas_kwargs(cfg),
        )
    if path is not None:
        # the descend walk already recorded the leaf's ancestor path — back
        # up along it instead of re-walking the parent pointers
        return backup_path(tree, path, acts, leaves, n_per_visit)
    return backup(tree, leaves, n_per_visit)


def simulate_multi(tree, eval_fn, key, cfg: MCTSConfig, max_levels=None,
                   pad_walk_to=None, return_backup_inputs=False):
    """One batched-MCTS pass: K = cfg.leaves_per_pass leaves descend, expand
    and back up together, sharing ONE all-node policy solve and ONE net eval
    over the K*B leaf worlds (the amortization the reference cannot do — its
    per-thread walk is inherently one-leaf, mcts/cpp/cuda.cu:138-182).

    Divergence from K sequential sims (deliberate, K=1 stays exact): the K
    walks sample i.i.d. from the SAME pre-pass tree stats (policy sampling
    already diversifies them — no virtual loss needed), duplicate draws of
    one unexpanded edge collapse to one node expansion backed up once per
    draw, and a pass consumes K node slots regardless of duplicates.

    CONTRACT: at most ceil((n_nodes-1)/K) calls per tree (what `mcts()`
    issues). The walk unrolls only L_cap = n_passes+1 levels — tree depth
    grows <=1 per pass, so that bound is exact within the contract, but a
    deeper tree from EXTRA calls would silently truncate the walk at an
    internal node and overwrite one of its child edges on expansion.
    """
    K = cfg.leaves_per_pass
    B, T, A = tree.children.shape
    k_rand, k_eval = jax.random.split(key)
    rands = jax.random.uniform(k_rand, (K, B, T))

    # explicit opt-in only: the K-sample kernel measured 89ms/pass vs the XLA
    # solve+sample pair's 24ms at 16k envs 9x9 K=8 (small (E,T,A) tiles are
    # VPU-bound; XLA fuses the Newton chain onto bigger tiles) — kept as a
    # variant for the auto='None' case NOT to pick up
    if K > 1 and cfg is not None and bool(cfg.pallas_nodes):
        from . import pallas_kernels

        with jax.named_scope("solve"):
            a_bkt, c_bkt = pallas_kernels.node_actions_multi(
                tree, jnp.moveaxis(rands, 0, 1), _q_bounds(tree),
                block_envs=cfg.pallas_nodes_envs,
                interpret=cfg.pallas_nodes == "interpret",
                mesh=cfg.mesh, mesh_axis=cfg.mesh_axis,
                n_iters=cfg.solve_iters, accel=cfg.solve_accel,
            )
        acts = jnp.moveaxis(a_bkt, 1, 0)  # (K,B,T)
        nxts = jnp.moveaxis(c_bkt, 1, 0)
    else:
        use_warm = K > 1 and cfg.warm_solve and tree.alpha is not None
        with jax.named_scope("solve"):
            # one solve for all K; K>1 warm-starts from the previous pass's
            # converged alphas and stores this pass's for the next
            if use_warm:
                probs, alpha_new = node_probs(
                    tree, _q_bounds(tree), warm_alpha=tree.alpha,
                    n_iters=cfg.solve_iters, accel=cfg.solve_accel,
                    return_alpha=True,
                )
                tree = tree.replace(alpha=alpha_new)
            elif K > 1 and _pallas_solve_enabled(cfg):
                from . import pallas_kernels

                mode = cfg.pallas_solve
                alpha_mode = isinstance(mode, str) and mode.startswith("alpha")
                qb = _q_bounds(tree)
                res = pallas_kernels.solve_probs(
                    tree, qb,
                    n_iters=cfg.solve_iters, accel=cfg.solve_accel,
                    block_rows=cfg.pallas_solve_rows or None,
                    interpret=mode in ("interpret", "alpha_interpret"),
                    mesh=cfg.mesh, mesh_axis=cfg.mesh_axis,
                    out="alpha" if alpha_mode else "probs",
                )
                # alpha mode: the kernel returns only the converged Newton
                # roots; the probs evaluation runs in XLA where it fuses into
                # the sampler (no (B,T,A) f32 probs round trip through HBM)
                probs = (node_probs(tree, qb, fixed_alpha=res)
                         if alpha_mode else res)
            else:
                probs = node_probs(
                    tree, _q_bounds(tree),
                    n_iters=cfg.solve_iters if K > 1 else 16,
                    accel=cfg.solve_accel if K > 1 else False,
                )
        if K > 1 and _pallas_sample_enabled(cfg, B):
            from . import pallas_kernels

            with jax.named_scope("sample"):
                a_bkt, c_bkt = pallas_kernels.sample_children_multi(
                    probs, tree.children, jnp.moveaxis(rands, 0, 1),
                    block_envs=cfg.pallas_sample_envs,
                    interpret=cfg.pallas_sample == "interpret",
                    mesh=cfg.mesh, mesh_axis=cfg.mesh_axis,
                )
            acts = jnp.moveaxis(a_bkt, 1, 0)  # (K,B,T)
            nxts = jnp.moveaxis(c_bkt, 1, 0)
        else:
            with jax.named_scope("sample"):
                acts, nxts = _sample_children_multi(
                    tree, probs, rands, cum_mode=cfg.sample_cum)  # (K,B,T) x2

    # K pointer chases, folded into the batch axis. Tree depth grows <=1 per
    # pass (all K walks see the same pre-pass tree), so no walk over mcts()'s
    # n_passes calls is longer than n_passes (+1 margin): the XLA walk unrolls
    # only L_cap levels instead of T, and the path record shrinks every
    # backup contraction's level axis by ~T/L
    n_passes = -(-(cfg.n_nodes - 1) // K)
    # grow mode tightens this per pass: at pass p the tree is at most p+1
    # deep, so p+2 levels suffice (same +1 margin as the n_passes bound)
    L_cap = min(T, max_levels if max_levels is not None else n_passes + 1)
    with jax.named_scope("walk"):
        term_flat = jnp.broadcast_to(tree.terminal[None], (K, B, T)).reshape(K * B, T)
        p_f, a_f, h_f, path_f = _walk_flat(
            term_flat, acts.reshape(K * B, T), nxts.reshape(K * B, T), cfg,
            max_levels=L_cap, pad_to=pad_walk_to,
        )
    parents = p_f.reshape(K, B)
    actions = a_f.reshape(K, B)
    halt_child = h_f.reshape(K, B)
    paths = path_f.reshape(K, B, path_f.shape[-1])[:, :, :L_cap]

    # dedup: walks halting at the same (parent, action) edge collapse — only
    # the FIRST writes; later ones redirect their leaf to the first's slot
    keys_e = parents * A + actions  # (K,B) edge ids (injective)
    new = halt_child == -1
    slots = tree.sim + jnp.arange(K, dtype=jnp.int32)  # (K,)
    leaves = jnp.where(new, slots[:, None], halt_child)  # (K,B)
    write = [jnp.ones((B,), bool)]
    for k in range(1, K):
        dup = jnp.zeros((B,), bool)
        for j in range(k):
            same = keys_e[j] == keys_e[k]
            dup = dup | same
            leaves = leaves.at[k].set(jnp.where(same, leaves[j], leaves[k]))
        write.append(~dup)
    write = jnp.stack(write)  # (K,B)

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    # All routing contractions below are EXACT in bf16: every output cell has
    # at most ONE nonzero contributor (walks are write-deduped and a row
    # lookup hits one row), one-hot coefficients are 0/1, and every integer
    # payload routed here (node slots < T, actions < A, uint8 cell labels,
    # seats) is < 2^8 — exactly representable in bf16's 8-bit mantissa AS
    # LONG AS T, A <= 256; bigger trees route indices in f32 (bf16 rounds
    # integers > 256 to even, silently cross-linking pointers). bf16 halves
    # the HBM traffic of the (B,T,F) materializations (traced ~13ms/search of
    # the writes scope at 16k envs). f32 payloads (net values/value sums)
    # keep f32 so no real rounding ever leaks in.
    idx_ct = bf16 if max(T, A) <= 256 else f32
    ohP = jax.nn.one_hot(parents, T, dtype=bf16)  # (K,B,T); -1 rows -> zero
    ohA = jax.nn.one_hot(actions, A, dtype=bf16)  # (K,B,A)
    ohL = jax.nn.one_hot(leaves, T, dtype=bf16) * write[:, :, None]  # (K,B,T)

    def _route_dtype(dtype):
        # bf16 routing is exactness-safe only when every routed VALUE fits
        # bf16's 8-bit mantissa. The idx_ct guard bounds node/action INDICES
        # (T, A <= 256) but says nothing about world payload ranges — a wide
        # integer world field (e.g. an int32 env-id or move counter) can hold
        # values > 256 that bf16 silently rounds to even. So: only bool,
        # sub-byte integers (< 2^8 by type) and bf16 itself ride idx_ct;
        # every other dtype routes through f32 (exact to 2^24).
        dt = jnp.dtype(dtype)
        if dt == jnp.bfloat16 or dt.kind == "b" or (dt.kind in "iu" and dt.itemsize == 1):
            return idx_ct
        return f32

    # children pointers (write-deduped, so every (t,a) cell has at most one
    # contributor): select-chain or one-hot contraction per write_mode
    if cfg.write_mode == "select":
        children = tree.children
        iota_Tc = jnp.arange(T)
        iota_A = jnp.arange(A)
        for k in range(K):
            cell = ((iota_Tc == parents[k][:, None])[:, :, None]
                    & (iota_A == actions[k][:, None])[:, None, :]
                    & write[k][:, None, None])
            children = jnp.where(
                cell, leaves[k][:, None, None].astype(children.dtype), children)
    else:
        ohPw = ohP * write[:, :, None]
        mask_e = jnp.einsum("kbt,kba->bta", ohPw, ohA, preferred_element_type=bf16)
        val_e = jnp.einsum("kbt,kba->bta", ohPw.astype(idx_ct),
                           ohA.astype(idx_ct) * leaves[:, :, None].astype(idx_ct),
                           preferred_element_type=idx_ct)
        children = jnp.where(mask_e > 0.5, val_e.astype(tree.children.dtype),
                             tree.children)

    # leaf worlds: gather the K parent rows (one-hot contraction streaming
    # each big tensor once for all K, or a batched row gather — see
    # MCTSConfig.gather_mode), step them, evaluate in one K*B batch
    parents_bk = jnp.moveaxis(parents, 0, 1)  # (B,K); parents are always >=0

    def gather_rows(full):  # (B,T,...) -> (K,B,...)
        if cfg.gather_mode == "take":
            idx = parents_bk.reshape((B, K) + (1,) * (full.ndim - 2))
            out = jnp.take_along_axis(full, idx.astype(jnp.int32), axis=1)
            return jnp.moveaxis(out, 1, 0)
        ct = _route_dtype(full.dtype)
        flat = full.reshape(B, T, -1).astype(ct)
        out = jnp.einsum("kbt,btf->kbf", ohP.astype(ct), flat,
                         preferred_element_type=ct)
        return out.reshape((K, B) + full.shape[2:]).astype(full.dtype)

    with jax.named_scope("gather"):
        old_worlds = jax.tree.map(gather_rows, tree.worlds)
        old_flat = jax.tree.map(lambda x: x.reshape((K * B,) + x.shape[2:]), old_worlds)
    with jax.named_scope("envstep"):
        world_flat, transition = old_flat.step(actions.reshape(K * B))
    with jax.named_scope("eval"):
        decisions = eval_fn(world_flat, k_eval)

    # sums of K disjoint 0/1 lanes: exact in bf16 (K <= 2^8)
    row_mask = jnp.einsum("kbt->bt", ohL) > 0.5  # (B,T)

    iota_T = jnp.arange(T)
    # per-k leaf-row masks for the select-chain write mode (disjoint rows —
    # ohL is write-deduped, so chain order is irrelevant)
    sel_masks = (iota_T == leaves[:, :, None]) & write[:, :, None]  # (K,B,T)

    def set_rows(full, new_kb):
        # full (B,T,F...) <- new (K,B,F...) at the deduped leaf rows.
        # NOTE: kept per-field (not packed into one concatenated form) —
        # packing all payloads through one contraction measured 3% SLOWER
        # on chip (0.2495 -> 0.2581s/search): the concat materializes a
        # (K,B,sumF) copy that the per-field form lets XLA fuse away into
        # each producer.
        if cfg.write_mode == "select":
            # K masked selects fused into one elementwise stream: the big
            # tensor is read+written once, the (K,B,F) payloads broadcast
            # along the row axis inside the fusion — no one-hot matmul and
            # no routed-val materialization (the einsum form traced ~21ms
            # vs a ~4ms write roofline at the 16k-env flagship)
            acc = full
            for k in range(K):
                mask = sel_masks[k].reshape((B, T) + (1,) * (full.ndim - 2))
                acc = jnp.where(mask, new_kb[k][:, None].astype(full.dtype), acc)
            return acc
        ct = _route_dtype(full.dtype)
        newf = new_kb.reshape(K, B, -1).astype(ct)
        val = jnp.einsum("kbt,kbf->btf", ohL.astype(ct), newf,
                         preferred_element_type=ct)
        val = val.reshape((B, T) + new_kb.shape[2:])
        mask = row_mask.reshape((B, T) + (1,) * (full.ndim - 2))
        return jnp.where(mask, val.astype(full.dtype), full)

    unflat = lambda x: x.reshape((K, B) + x.shape[1:])
    upd = {}
    with jax.named_scope("writes"):
        if tree.prew is not None:
            # cumulative-reward maintenance for the prefix backup: the new
            # leaf's prefix = its parent's (inclusive) prefix + its own
            # reward. (B,T,S) with S tiny — one small extra gather+write.
            p_par = jnp.einsum("kbt,bts->kbs", ohP.astype(f32),
                               tree.prew.astype(f32), preferred_element_type=f32)
            upd["prew"] = set_rows(
                tree.prew, p_par + unflat(transition.rewards).astype(f32))
        tree = tree.replace(
            children=children,
            parents=set_rows(tree.parents, jnp.broadcast_to(parents, (K, B))),
            relation=set_rows(tree.relation, actions),
            worlds=jax.tree.map(
                lambda full, new: set_rows(full, unflat(new)), tree.worlds, world_flat
            ),
            seats=set_rows(tree.seats, unflat(world_flat.seats.astype(jnp.int32))),
            terminal=set_rows(tree.terminal, unflat(transition.terminal)),
            rewards=set_rows(tree.rewards, unflat(transition.rewards)),
            logits=set_rows(tree.logits, unflat(_clamp_logits(decisions["logits"]))),
            v=set_rows(tree.v, unflat(decisions["v"])),
            sim=tree.sim + K,
            **upd,
        )

    n_per_visit = tree.w.shape[-1] if cfg.backup_n == "seats" else 1
    if return_backup_inputs:
        # test hook: the post-write tree plus the exact backup inputs, so
        # parity tests can jit this and compare backup formulations on
        # concrete arrays (an unjitted mcts() is unusable here — the
        # remote-compile hook costs ~0.4s per eager op)
        return tree, paths, acts, leaves, n_per_visit
    with jax.named_scope("backup"):
        if K > 1 and tree.prew is not None:
            return backup_paths_prefix(tree, paths, acts, leaves, n_per_visit)
        return backup_paths(tree, paths, acts, leaves, n_per_visit)


def root(tree):
    """The improved root policy (training target), prior, and root value
    (reference mcts/__init__.py:142-149)."""
    B = tree.children.shape[0]
    probs = _node_policy(tree, jnp.zeros((B,), jnp.int32), _q_bounds(tree))
    return {
        "logits": jnp.log(probs),
        "prior": _unclamp_logits(tree.logits[:, 0].astype(jnp.float32)),
        "v": tree.v[:, 0],
    }


def n_leaves(tree):
    """Number of leaf nodes per env (reference mcts/__init__.py:151-152)."""
    return ((tree.children == -1).all(-1) & (tree.parents != -1)).sum(-1)


_T_AXIS_FIELDS = ("children", "parents", "relation", "seats", "terminal",
                  "rewards", "logits", "v", "n", "w", "n_edge", "w_edge")


def _slice_tree(tree, R):
    """First-R-rows view of the tree (node axis). The growing-pass mode of
    `mcts` runs each multi-leaf pass on exactly the rows that can be live,
    shrinking every node-wise stream by T/R."""
    upd = {f: getattr(tree, f)[:, :R] for f in _T_AXIS_FIELDS}
    upd["worlds"] = jax.tree.map(lambda x: x[:, :R], tree.worlds)
    if tree.alpha is not None:
        upd["alpha"] = tree.alpha[:, :R]
    if tree.prew is not None:
        upd["prew"] = tree.prew[:, :R]
    return tree.replace(**upd)


def _pad_tree(tree, R):
    """Extend the node axis to R rows with `build()`'s initial values.

    The grow-pass loop previously round-tripped the FULL tree every pass
    (slice R rows out, simulate, `dynamic_update_slice` them back over all T
    rows) — traced at ~22ms of pure copy per 16k-env search. Untouched rows
    are by construction still at their build() init (children/parents/
    relation = -1, stats = 0, worlds/seats = the immutable root row
    broadcast), so appending freshly-initialized rows is bit-identical to
    carrying them, and the concat fuses into the pass's own tree writes."""
    B, T_cur = tree.parents.shape
    n_new = R - T_cur

    def pad_const(x, fill):
        blk = jnp.full((B, n_new) + x.shape[2:], fill, x.dtype)
        return jnp.concatenate([x, blk], axis=1)

    def pad_root(x):  # replicate row 0 (the root never changes mid-search)
        blk = jnp.broadcast_to(x[:, :1], (B, n_new) + x.shape[2:])
        return jnp.concatenate([x, blk], axis=1)

    upd = dict(
        children=pad_const(tree.children, -1),
        parents=pad_const(tree.parents, -1),
        relation=pad_const(tree.relation, -1),
        worlds=jax.tree.map(pad_root, tree.worlds),
        seats=pad_root(tree.seats),
        terminal=pad_const(tree.terminal, False),
        rewards=pad_const(tree.rewards, 0),
        logits=pad_const(tree.logits, 0),
        v=pad_const(tree.v, 0),
        n=pad_const(tree.n, 0),
        w=pad_const(tree.w, 0),
        n_edge=pad_const(tree.n_edge, 0),
        w_edge=pad_const(tree.w_edge, 0),
    )
    if tree.alpha is not None:
        upd["alpha"] = pad_const(tree.alpha, 0)
    if tree.prew is not None:
        upd["prew"] = pad_const(tree.prew, 0)
    return tree.replace(**upd)


def mcts(world, eval_fn, key, cfg: MCTSConfig):
    """Full search: initialize the root, then n_nodes-1 node expansions as
    one `lax.scan` (reference mcts/__init__.py:200-207) — one leaf per sim,
    or K per pass when cfg.leaves_per_pass > 1 (batched MCTS)."""
    k_init, k_sims = jax.random.split(key)

    tree = build(world, cfg)
    decisions = eval_fn(world, None)
    tree = initialize(tree, decisions, k_init, cfg, world.valid)

    K = cfg.leaves_per_pass
    if K > 1 and cfg.grow_passes:
        # triangular passes: pass p touches only rows [0, 1+(p+1)K) — a
        # Python loop over distinct static shapes instead of a scan. The walk
        # kernel runs PADDED to the full T so one Mosaic variant serves every
        # pass (see _walk_flat); the K-sampler kernel stays off by default
        # (per-R Mosaic variants aren't worth it) but explicit True/interpret
        # still forces it. The solve kernel is cheap to compile per-R (small
        # straight-line body) and runs on the sliced rows.
        gcfg = replace(
            cfg,
            pallas_sample=bool(cfg.pallas_sample) if cfg.pallas_sample is not None else False,
        ) if cfg.pallas_sample is None else cfg
        T = tree.children.shape[1]
        n_passes = -(-(cfg.n_nodes - 1) // K)
        # grow by PADDING, not slice+write-back: each pass appends K freshly
        # initialized rows to the previous pass's R rows (see _pad_tree). The
        # build()-sized tree is sliced once up front; XLA dead-code-eliminates
        # the unused tail. build() sizes T = 1 + K*n_passes, so the last
        # pass's tree is already full-T — no final pad needed.
        sub = _slice_tree(tree, min(T, 1 + K))
        for p in range(n_passes):
            R = min(T, 1 + (p + 1) * K)
            if sub.parents.shape[1] < R:
                sub = _pad_tree(sub, R)
            sub = simulate_multi(
                sub, eval_fn, jax.random.fold_in(k_sims, p), gcfg,
                max_levels=p + 2, pad_walk_to=T,
            )
        return sub
    if K > 1:
        n_passes = -(-(cfg.n_nodes - 1) // K)

        def body(tree, k):
            return simulate_multi(tree, eval_fn, k, cfg), None

        keys = jax.random.split(k_sims, n_passes)
    else:

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
