"""Gradient noise-scale study.

Reference counterpart: boardlaw/noisescales.py — estimates the critical batch
size from gradient statistics, three ways:

(a) online from Adam's moments during training (learning.noise_scale, logged
    each step by train.py);
(b) offline per stored agent: collect a FRESH self-play chunk with the
    agent's own search settings, compute per-timestep policy/value/joint
    gradients, persist components to the noise_scales SQL table
    (noisescales.py:39-120, 148-158);
(c) sweep drivers over a run's snapshots x test-search settings
    (noisescales.py:160-186) plus an in-training hook (NoiseScales,
    noisescales.py:236-253) and the analysis join (load, :205-228).

Field names follow the reference schema: mean_sq = |mean_t g_t|^2 (squared
mean gradient), sq_mean = mean_t |g_t|^2, variance = per-parameter variance
over timesteps with the T/(T-1) correction. Noise scale B_crit ~
batch_size * variance / mean_sq (McCandlish et al.).
"""
from __future__ import annotations

from logging import getLogger

import jax
import jax.numpy as jnp
import numpy as np

from . import learning, sql
from .envs import hex
from .mcts import MCTSAgent
from .pavlov import stats as pstats

log = getLogger(__name__)

NODE_SWEEP = [1, 2, 4, 8, 16, 32, 64]
C_SWEEP = [1 / 64, 1 / 32, 1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0]


# ---------------------------------------------------------------------------
# Gradient statistics (shared by offline study and generic measure())
# ---------------------------------------------------------------------------

def gradient_stats(grad_fn, batches):
    """Per-slice flat gradients -> noise-scale components (reference
    noisescales.py:96-107).

    grad_fn(batch) must return a gradient pytree; `batches` is an iterable of
    equal-size batches (the reference's per-timestep slices).
    """
    flats = []
    for b in batches:
        g = grad_fn(b)
        flats.append(jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(g)]))
    return flat_gradient_stats(jnp.stack(flats))


def flat_gradient_stats(G):
    """Components from a stacked (K, P) gradient matrix. mean_sq/sq_mean
    naming matches the reference DB schema (noisescales.py:98-103)."""
    K = G.shape[0]
    mean_g = G.mean(0)
    bessel = K / max(K - 1, 1)
    return {
        "mean_sq": float(jnp.square(mean_g).mean()),
        "sq_mean": float(jnp.square(G).mean()),
        "variance": float(jnp.square(G - mean_g[None]).mean(0).mean() * bessel),
        "n_params": float(G.shape[1]),
        "batches": float(K),
    }


def noise_scale(stats, batch_size):
    """B_crit ~ batch * var / |mean grad|^2 (reference noisescales.py:109)."""
    return batch_size * stats["variance"] / max(stats["mean_sq"], 1e-12)


def measure(model, params, batch, loss_fn, n_slices=8, batch_size=None):
    """Split a replay batch into `n_slices` equal slices, measure gradient
    statistics for the loss. loss_fn(params, sub_batch) -> scalar."""
    B = jax.tree.leaves(batch)[0].shape[0]
    k = B // n_slices
    grad_fn = jax.jit(jax.grad(loss_fn))

    def slices():
        for i in range(n_slices):
            yield jax.tree.map(lambda x: x[i * k : (i + 1) * k], batch)

    stats = gradient_stats(lambda b: grad_fn(params, b), slices())
    stats["batch_size"] = float(batch_size or k)
    return stats


# ---------------------------------------------------------------------------
# Offline per-agent study: fresh chunk -> per-timestep grads -> SQL
# ---------------------------------------------------------------------------

def _agent_assets(agent_id):
    """(model, params, MCTSAgent, boardsize) for a results-DB agent row,
    honouring the row's test-time search settings (reference
    noisescales.py:28-38)."""
    from .arena import common
    from .pavlov import runs, storage as pstorage
    from .train import TrainConfig, build_model

    info = sql.agent_query().loc[int(agent_id)]
    run = runs.resolve(info.run)
    spec = pstorage.load_raw(run, "model")
    cfg = TrainConfig(**spec["cfg"])
    model = build_model(cfg)
    sd = pstorage.load_snapshot(run, int(info.idx))
    params = jax.tree.map(jnp.asarray, sd["agent"]["params"])

    def eval_fn(world, key=None):
        return model.apply(params, world.obs, world.valid, world.seats)

    agent = MCTSAgent(eval_fn, n_nodes=int(info.test_nodes), c_puct=float(info.test_c))
    return model, params, agent, int(info.boardsize)


def collect(agent_id, n_envs=1024, chunk_len=64, max_mixness=0.25, seed=0):
    """Self-play a FRESH (T, B) chunk with the stored agent until terminals
    are well mixed across the window (reference noisescales.py:39-64).

    Returns (model, params, chunk) where chunk holds obs/valid/seats, the
    search targets (logits, v) and reward_to_go, all (T, B, ...).
    """
    model, params, agent, boardsize = _agent_assets(agent_id)
    world = hex.Hex.initial(n_envs, boardsize)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def chunk_step(world, key):
        d = agent(world, key)
        new_world, transition = world.step(d["actions"])
        rec = {
            "obs": world.obs,
            "valid": world.valid,
            "seats": world.seats,
            "logits": d["logits"],
            "v": d["v"],
            "rewards": transition.rewards,
            "terminal": transition.terminal,
        }
        return new_world, rec

    # burn-in so the batch isn't phase-locked at ply 0, then collect; repeat
    # with further burn-in while the terminal density is too lumpy
    buffer = []
    for tries in range(8):
        for _ in range(chunk_len):
            key, sub = jax.random.split(key)
            world, rec = chunk_step(world, sub)
            buffer.append(rec)
        buffer = buffer[-chunk_len:]
        chunk = jax.tree.map(lambda *xs: jnp.stack(xs), *buffer)
        per_t = np.asarray(chunk["terminal"].mean(1))
        med = max(float(np.median(per_t)), 1e-6)
        mixness = (per_t.max() - per_t.min()) / med
        if mixness < max_mixness:
            break
        log.info(f"collect({agent_id}): mixness {mixness:.2f}, re-collecting")

    term = jnp.broadcast_to(chunk["terminal"][..., None], chunk["rewards"].shape)
    chunk["reward_to_go"] = learning.reward_to_go(chunk["rewards"], chunk["v"], term)
    return model, params, chunk


def _chunk_losses(model, params, batch):
    """Policy/value losses over one timestep's batch — the same forms the
    trainer optimises (reference noisescales.py:66-94)."""
    d = model.apply(params, batch["obs"], batch["valid"], batch["seats"])
    zeros = jnp.zeros_like(d["logits"])
    l = jnp.where(d["logits"] > -jnp.inf, d["logits"], zeros)
    l0 = jnp.where(batch["logits"] > -jnp.inf, batch["logits"].astype(jnp.float32), zeros)
    policy = -(jnp.exp(l0) * l).sum(-1).mean()
    value = jnp.square(batch["reward_to_go"] - d["v"]).mean()
    return policy, value


def gradients(model, params, chunk):
    """Per-timestep flat policy/value/joint gradients, (T, P) each, via one
    compiled scan over the chunk (reference noisescales.py:66-94 loops the
    timesteps host-side; here the whole study is one XLA program)."""

    def flat(tree):
        return jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(tree)])

    def per_t(batch):
        gp = jax.grad(lambda p: _chunk_losses(model, p, batch)[0])(params)
        gv = jax.grad(lambda p: _chunk_losses(model, p, batch)[1])(params)
        fp, fv = flat(gp), flat(gv)
        return {"policy": fp, "value": fv, "joint": fp + fv}

    def body(_, batch):
        return None, per_t(batch)

    _, gs = jax.lax.scan(body, None, chunk)
    return gs


def evaluate_noise_scale(agent_id, n_envs=1024, chunk_len=64):
    """Collect + measure + persist one agent's noise-scale rows; skips agents
    already in the DB (reference noisescales.py:111-120)."""
    extant = sql.query("select * from noise_scales where agent_id == ?", int(agent_id))
    if len(extant):
        return extant
    model, params, chunk = collect(agent_id, n_envs=n_envs, chunk_len=chunk_len)
    fields = {k: chunk[k] for k in ("obs", "valid", "seats", "logits", "reward_to_go")}
    gs = jax.jit(lambda c: gradients(model, params, c))(fields)
    B = chunk["obs"].shape[1]
    for kind, G in gs.items():
        comp = flat_gradient_stats(G)
        comp["batch_size"] = float(B)
        sql.save_noise_scale(int(agent_id), kind, **comp)
        log.info(f"{agent_id}/{kind}: noise scale {noise_scale(comp, B):.0f}")
    return sql.query("select * from noise_scales where agent_id == ?", int(agent_id))


def agents_opponent(agent_id, nodes=64, c=1 / 16):
    """The canonical-settings agent of the same snapshot, used as the perf
    yardstick (reference noisescales.py:122-128)."""
    rows = sql.query(
        "select agents.id from agents where snap == "
        "(select snap from agents where id == ?) and nodes == ? and c == ?",
        int(agent_id), int(nodes), float(c),
    )
    return int(rows.id.iloc[0])


def evaluate_perf(agent_id, n_envs=256):
    """Play the agent against its snapshot's canonical opponent and persist
    the trials (reference noisescales.py:130-146)."""
    from .arena import common

    opponent_id = agents_opponent(agent_id)
    extant = sql.query(
        "select * from trials where ((black_agent == ?) and (white_agent == ?))"
        " or ((white_agent == ?) and (black_agent == ?))",
        int(agent_id), int(opponent_id), int(agent_id), int(opponent_id),
    )
    games = (extant.black_wins + extant.white_wins).sum() if len(extant) else 0
    if games >= n_envs:
        return
    a = common.sql_agent(agent_id)
    o = common.sql_agent(opponent_id)
    w = common.sql_world(agent_id, n_envs)
    results = common.evaluate(w, [(agent_id, a), (opponent_id, o)])
    sql.save_trials(
        (
            int(r["names"][0]), int(r["names"][1]),
            int(r["wins"][0]), int(r["wins"][1]),
            int(r["moves"]), float(r["times"]),
        )
        for r in results
    )


def evaluate(run, idx, nodes, c_puct, perf=True, n_envs=1024, chunk_len=64):
    """Register the (snap, nodes, c) agent row if absent, then measure its
    noise scale (and optionally its perf trial) — the sweep unit (reference
    noisescales.py:148-158)."""
    snap = sql.query("select id from snaps where run == ? and idx == ?", run, int(idx))
    if not len(snap):
        raise KeyError(f"no snapshot {run}/{idx} — run sql.refresh() first")
    snap_id = int(snap.id.iloc[0])
    extant = sql.query(
        "select * from agents where snap == ? and nodes == ? and c == ?",
        snap_id, int(nodes), float(c_puct),
    )
    if not len(extant):
        sql.execute(
            "insert into agents values (null, ?, ?, ?)", snap_id, int(nodes), float(c_puct)
        )
        extant = sql.query(
            "select * from agents where snap == ? and nodes == ? and c == ?",
            snap_id, int(nodes), float(c_puct),
        )
    agent_id = int(extant.id.iloc[0])
    evaluate_noise_scale(agent_id, n_envs=n_envs, chunk_len=chunk_len)
    if perf:
        evaluate_perf(agent_id)
    return agent_id


def sweep(run, idxs=None, nodes=None, cs=None, perf=False, n_envs=1024):
    """Sweep a run's snapshots over test-search settings (reference
    noisescales.py:160-176 farms this over a CUDA pool; one TPU chip runs the
    whole grid sequentially — each unit is a single fused program)."""
    sql.refresh()
    snaps = sql.query("select * from snaps where run == ?", run)
    idxs = snaps.idx.unique() if idxs is None else idxs
    done = []
    for idx in idxs:
        for n in nodes or NODE_SWEEP:
            for c in cs or C_SWEEP:
                done.append(evaluate(run, idx, n, c, perf=perf, n_envs=n_envs))
    return done


def load():
    """Join measured noise scales onto agent details for analysis (reference
    noisescales.py:205-228)."""
    import pandas as pd

    details = sql.agent_query()
    noise = (
        sql.query("select * from noise_scales")
        .set_index(["agent_id", "kind"])
        .pipe(lambda df: df.batch_size * df.variance / df.mean_sq)
        .unstack()
    )
    df = pd.merge(details, noise, left_index=True, right_index=True, how="inner")
    df["params"] = df.width**2 * df.depth
    df["tree_spec"] = df.test_c.astype(str) + "/" + df.test_nodes.astype(str)
    return df


# ---------------------------------------------------------------------------
# In-training hook
# ---------------------------------------------------------------------------

class NoiseScales:
    """Every `buffer_len` steps, measure per-timestep gradient noise over the
    current chunk and log the components + scales through pavlov (reference
    noisescales.py:236-253)."""

    def __init__(self, model, buffer_len=64):
        self._model = model
        self._count = 0
        self._buffer_len = buffer_len
        self._grads = None

    def step(self, params, chunk):
        if self._count % self._buffer_len == 0:
            if self._grads is None:
                model = self._model
                self._grads = jax.jit(lambda p, c: gradients(model, p, c))
            gs = self._grads(params, chunk)
            B = jax.tree.leaves(chunk)[0].shape[1]
            for kind, G in gs.items():
                comp = flat_gradient_stats(G)
                comp["batch_size"] = float(B)
                for k, v in comp.items():
                    pstats.silent(f"noise.{k}.{kind}", v)
                pstats.mean(f"noise.{kind}", noise_scale(comp, B))
        self._count += 1


def persist(agent_id, kind, stats):
    """Record a measurement in the results DB."""
    sql.save_noise_scale(agent_id, kind, **stats)
