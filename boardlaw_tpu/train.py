"""The actor-learner self-play training loop.

Reference counterpart: boardlaw/main.py. Same shape: a rolling buffer of the
last `buffer_len` self-play steps feeds a learner that each iteration samples
one random timestep per env (32k-sample batches), optimizing policy
cross-entropy against the MCTS root targets plus value MSE against
reward-to-go (main.py:76-145, 147-200).

TPU-first differences:
  * The whole train iteration — one MCTS-driven actor step, the buffer
    update, reward-to-go recomputation, and the Adam step — is ONE jitted
    program (`train_step`). No host round-trips; stats come back as a dict of
    device scalars written to pavlov channels afterwards (deferred I/O).
  * bf16 compute replaces AMP + GradScaler (no scaler needed in bf16).
  * Step-level resume (missing in the reference — SURVEY.md §5.3): `latest`
    checkpoints carry params, optimizer state and counters, and `run(...,
    resume=...)` continues a run exactly.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from logging import getLogger

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd
from flax import struct

from . import learning, storage as bstorage
from .envs import hex
from .mcts import MCTSConfig, mcts as run_mcts, root as mcts_root, n_leaves
from .models.networks import FCModel
from .pavlov import device as pdevice, logs, runs, stats, storage as pstorage

log = getLogger(__name__)

# Best-known hyperparameters per boardsize (reference main.py:17-25)
BEST = pd.DataFrame(
    [
        [3, 2, 4, 64, 1 / 16],
        [4, 8, 2, 64, 1 / 16],
        [5, 16, 4, 64, 1 / 16],
        [6, 128, 1, 64, 1 / 16],
        [7, 128, 4, 64, 1 / 16],
        [8, 256, 4, 64, 1 / 16],
        [9, 512, 4, 64, 1 / 16],
    ],
    columns=["boardsize", "width", "depth", "nodes", "c_puct"],
)


@dataclass(frozen=True)
class TrainConfig:
    boardsize: int
    width: int
    depth: int
    n_envs: int = 32 * 1024
    buffer_len: int = 64
    n_nodes: int = 64
    c_puct: float = 1 / 16
    noise_eps: float = 0.25
    lr: float = 1e-3
    mix_steps: int = 2500
    seed: int = 0
    dtype: str = "float32"  # network compute dtype ('bfloat16' on TPU)
    tree_dtype: str = "float32"  # MCTS tree logits storage
    # replay logits/prior storage — half precision like the reference's
    # `decisions.half()` buffer (main.py:179); losses upcast to f32
    buffer_dtype: str = "bfloat16"
    # None = auto, True/False to force, 'interpret' for CPU interpreter mode
    use_pallas: object = None
    pallas_block_envs: int = 32
    pallas_backup_envs: int = 16
    pallas_nodes: object = None  # the production descend kernel (see MCTSConfig)
    pallas_nodes_envs: int = 16
    pallas_walk: object = None  # the pointer-chase kernel (see MCTSConfig)
    pallas_walk_envs: int = 256
    pallas_sample: object = None  # the K-sampler kernel (see MCTSConfig)
    pallas_sample_envs: int = 64
    pallas_solve: object = None  # the all-node solve kernel (see MCTSConfig)
    pallas_solve_rows: int = 0  # 0 = auto block size
    # batched MCTS: K leaves per pass sharing one solve + one K*B net eval
    # (see MCTSConfig.leaves_per_pass; 1 = reference-exact sequential search)
    leaves_per_pass: int = 1
    solve_iters: int = 6  # K>1 solve budget (see MCTSConfig)
    grow_passes: bool = False  # triangular multi-leaf passes (see MCTSConfig)
    backup_mode: str = "prefix"  # K>1 backup formulation (see MCTSConfig)
    write_mode: str = "einsum"  # K>1 leaf-row write routing (see MCTSConfig)
    gather_mode: str = "einsum"  # K>1 parent-row gather (see MCTSConfig)
    solve_accel: bool = True  # safeguarded-Halley acceleration
    warm_solve: bool = False  # K>1 warm-start (measured net loss, see MCTSConfig)
    sample_cum: str = "matmul"  # K>1 sampler prefix sum (see MCTSConfig)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def mcts_config(self, mesh=None, mesh_axis="dp"):
        return MCTSConfig(
            n_nodes=self.n_nodes,
            c_puct=self.c_puct,
            noise_eps=self.noise_eps,
            tree_dtype=jnp.dtype(self.tree_dtype),
            use_pallas=self.use_pallas,
            pallas_block_envs=self.pallas_block_envs,
            pallas_backup_envs=self.pallas_backup_envs,
            pallas_nodes=self.pallas_nodes,
            pallas_nodes_envs=self.pallas_nodes_envs,
            pallas_walk=self.pallas_walk,
            pallas_walk_envs=self.pallas_walk_envs,
            pallas_sample=self.pallas_sample,
            pallas_sample_envs=self.pallas_sample_envs,
            pallas_solve=self.pallas_solve,
            pallas_solve_rows=self.pallas_solve_rows,
            leaves_per_pass=self.leaves_per_pass,
            grow_passes=self.grow_passes,
            backup_mode=self.backup_mode,
            write_mode=self.write_mode,
            gather_mode=self.gather_mode,
            solve_iters=self.solve_iters,
            solve_accel=self.solve_accel,
            warm_solve=self.warm_solve,
            sample_cum=self.sample_cum,
            mesh=mesh,
            mesh_axis=mesh_axis,
        )


class TrainState(struct.PyTreeNode):
    worlds: object
    buffer: dict  # leaves (buffer_len, n_envs, ...), circular over axis 0
    ptr: jnp.ndarray  # next write slot in the circular buffer
    params: dict
    opt_state: object
    key: jnp.ndarray
    step: jnp.ndarray  # learner steps taken


def _masked_corr(x, y, m):
    m = m.astype(jnp.float32)
    n = m.sum() + 1e-6
    mx = (x * m).sum() / n
    my = (y * m).sum() / n
    cov = ((x - mx) * (y - my) * m).sum() / n
    vx = (jnp.square(x - mx) * m).sum() / n
    vy = (jnp.square(y - my) * m).sum() / n
    return cov / jnp.sqrt(vx * vy + 1e-12)


def build_model(cfg: TrainConfig):
    world = hex.Hex.initial(1, cfg.boardsize)
    return FCModel(
        obs_space=world.obs_space,
        action_space=world.action_space,
        width=cfg.width,
        depth=cfg.depth,
        n_seats=world.n_seats,
        dtype=cfg.compute_dtype,
    )


def make_train(cfg: TrainConfig, mesh=None):
    """Build the jitted init/warmup/train_step functions for a config.

    Pass a `jax.sharding.Mesh` to run the Pallas MCTS kernels per-shard via
    shard_map (required for multi-chip — pallas_call is a custom call XLA
    cannot partition on its own); the rest of the program partitions under
    GSPMD from the state's shardings.
    """
    model = build_model(cfg)
    opt = optax.adam(cfg.lr)
    mcfg = cfg.mcts_config(mesh=mesh)
    B = cfg.n_envs
    T = cfg.buffer_len
    envs = jnp.arange(B)

    def eval_fn(params):
        def f(world, key=None):
            return model.apply(params, world.obs, world.valid, world.seats)

        return f

    def actor_record(params, worlds, key):
        """One self-play step for every env: search, act, step. Returns the
        new worlds plus the replay record of the pre-step state."""
        k_search, k_act = jax.random.split(key)
        tree = run_mcts(worlds, eval_fn(params), k_search, mcfg)
        r = mcts_root(tree)
        actions = jax.random.categorical(k_act, r["logits"], axis=-1)
        new_worlds, transition = worlds.step(actions)
        bdt = jnp.dtype(cfg.buffer_dtype)
        record = {
            "worlds": worlds,
            "logits": r["logits"].astype(bdt),
            "prior": r["prior"].astype(bdt),
            "v": r["v"].astype(jnp.float32),
            "n_leaves": n_leaves(tree).astype(jnp.int32),
            "terminal": transition.terminal,
            "rewards": transition.rewards.astype(jnp.float32),
        }
        return new_worlds, record

    def empty_buffer(worlds):
        _, record = jax.eval_shape(
            lambda w, k: actor_record(init_params(jax.random.PRNGKey(0)), w, k),
            worlds,
            jax.random.PRNGKey(0),
        )
        return jax.tree.map(lambda s: jnp.zeros((T,) + s.shape, s.dtype), record)

    def push(buffer, ptr, record):
        # circular write: one slot updated in place (a roll would copy the
        # whole ~GB buffer every actor step — and large fused roll+scan
        # programs fault this TPU runtime)
        return jax.tree.map(lambda buf, r: buf.at[ptr].set(r), buffer, record)

    def ordered(tree, ptr):
        # time-ordered view, oldest..newest (slot ptr is the oldest). Only
        # ever applied to SMALL leaves (rewards/v/terminal) — reordering the
        # full buffer would copy ~GBs every step.
        idx = (ptr + jnp.arange(T)) % T
        return jax.tree.map(lambda buf: jnp.take(buf, idx, axis=0), tree)

    def init_params(key):
        world = hex.Hex.initial(1, cfg.boardsize)
        return model.init(key, world.obs, world.valid, world.seats)

    @jax.jit
    def init(key):
        k_mix, k_params, k_loop = jax.random.split(key, 3)
        worlds = learning.mix(hex.Hex.initial(B, cfg.boardsize), k_mix, cfg.mix_steps)
        params = init_params(k_params)
        opt_state = opt.init(params)
        buffer = empty_buffer(worlds)
        return TrainState(
            worlds=worlds,
            buffer=buffer,
            ptr=jnp.array(0, jnp.int32),
            params=params,
            opt_state=opt_state,
            key=k_loop,
            step=jnp.array(0, jnp.int32),
        )

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def _warmup_chunk(state, k):
        def body(carry, _):
            worlds, buffer, ptr, key = carry
            key, sub = jax.random.split(key)
            worlds, record = actor_record(state.params, worlds, sub)
            return (worlds, push(buffer, ptr, record), (ptr + 1) % T, key), None

        (worlds, buffer, ptr, key), _ = jax.lax.scan(
            body, (state.worlds, state.buffer, state.ptr, state.key), None, length=k
        )
        return state.replace(worlds=worlds, buffer=buffer, ptr=ptr, key=key)

    def warmup(state, chunk=16):
        """Fill the buffer with buffer_len actor steps (no learning) — the
        reference's initial `while len(buffer) < buffer_len` (main.py:174).

        Runs as a host loop of <=`chunk`-step jitted scans: a single scan
        chaining 64 full searches (each with nested while_loops) aborts this
        TPU runtime — 32 works, 64 faults, independent of array sizes.
        """
        remaining = T
        while remaining > 0:
            k = min(chunk, remaining)
            state = _warmup_chunk(state, k)
            remaining -= k
        return state

    def losses(params, batch):
        worlds = batch["worlds"]
        d = model.apply(params, worlds.obs, worlds.valid, worlds.seats)

        zeros = jnp.zeros_like(d["logits"])
        l = jnp.where(d["logits"] > -jnp.inf, d["logits"], zeros)
        l0 = jnp.where(batch["logits"] > -jnp.inf, batch["logits"].astype(jnp.float32), zeros)

        policy_loss = -(jnp.exp(l0) * l).sum(-1).mean()
        target_v = batch["reward_to_go"]
        value_loss = jnp.square(target_v - d["v"]).mean()
        loss = policy_loss + value_loss

        p0 = jnp.where(batch["prior"] > -jnp.inf, batch["prior"].astype(jnp.float32), zeros)
        aux = {
            "loss.policy": policy_loss,
            "loss.value": value_loss,
            "resid-var.num": jnp.square(target_v - d["v"]).mean(),
            "resid-var.den": jnp.square(target_v).mean(),
            "kl-div.behaviour": ((p0 - l0) * jnp.exp(p0)).sum(-1).mean(),
            "kl-div.prior": ((p0 - l) * jnp.exp(p0)).sum(-1).mean(),
            "rel-entropy.policy": learning.rel_entropy(d["logits"])[0],
            "rel-entropy.targets": learning.rel_entropy(batch["logits"].astype(jnp.float32))[0],
            "v.target.mean": target_v.mean(),
            "v.target.std": target_v.std(),
            "v.outputs.mean": d["v"].mean(),
            "v.outputs.std": d["v"].std(),
            "policy-conc": jnp.exp(l0).max(-1).mean(),
        }
        return loss, aux

    @partial(jax.jit, donate_argnums=0)
    def train_step(state):
        """One actor step + one learner step, fully fused (main.py:171-198).

        The state is donated: the circular buffer and optimizer state update
        in place, so peak memory stays ~one copy of everything.
        """
        key, k_actor, k_sample = jax.random.split(state.key, 3)

        worlds, record = actor_record(state.params, state.worlds, k_actor)
        buffer = push(state.buffer, state.ptr, record)
        ptr = (state.ptr + 1) % T

        # value targets need only the SMALL time-ordered leaves ((T,B,S));
        # the big logits/worlds leaves are gathered per sampled slot below
        osmall = ordered(
            {k: buffer[k] for k in ("rewards", "v", "terminal")}, ptr
        )
        terminal = jnp.broadcast_to(
            osmall["terminal"][..., None], osmall["rewards"].shape
        )
        rtg = learning.reward_to_go(osmall["rewards"], osmall["v"], terminal)

        # one random timestep per env (reference main.py:169) — gather the
        # raw circular slot directly instead of materialising a reordered
        # copy of the whole buffer
        t_idx = jax.random.randint(k_sample, (B,), 0, T)
        slot = (ptr + t_idx) % T
        batch = jax.tree.map(lambda x: x[slot, envs], buffer)
        batch["reward_to_go"] = rtg[t_idx, envs]

        (loss, aux), grads = jax.value_and_grad(losses, has_aux=True)(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        gflat = jnp.concatenate([g.reshape(-1) for g in jax.tree.leaves(grads)])
        uflat = jnp.concatenate([u.reshape(-1) for u in jax.tree.leaves(updates)])

        # chunk telemetry (reference main.py:28-59)
        tail_terminal = record["terminal"]
        tail_rewards = record["rewards"]
        tb = osmall["terminal"][..., None]
        aux.update(
            {
                "loss.total": loss,
                "grad.norm": jnp.sqrt(jnp.square(gflat).sum()),
                "grad.max": jnp.abs(gflat).max(),
                "step.std": jnp.sqrt(jnp.square(uflat).mean()),
                "step.max": jnp.abs(uflat).max(),
                "n-trajs": tail_terminal.sum(),
                "wins.seat-0": (tail_rewards[:, 0] == 1).sum(),
                "wins.seat-1": (tail_rewards[:, 1] == 1).sum(),
                "mcts-n-leaves": record["n_leaves"].mean(),
                "corr.terminal": _masked_corr(osmall["v"], osmall["rewards"], tb),
                "corr.penultimate": _masked_corr(
                    osmall["v"][:-1], osmall["rewards"][1:], tb[1:]
                ),
                "noise-scale": learning.noise_scale(B, opt_state),
            }
        )

        return (
            state.replace(
                worlds=worlds,
                buffer=buffer,
                ptr=ptr,
                params=params,
                opt_state=opt_state,
                key=key,
                step=state.step + 1,
            ),
            aux,
        )

    return model, opt, init, warmup, train_step


# --------------------------------------------------------------------------
# Checkpoint plumbing (step-level resume — a gap in the reference)
# --------------------------------------------------------------------------

def state_dict(state: TrainState, cfg: TrainConfig):
    return {
        "params": state.params,
        "opt": list(jax.tree.leaves(state.opt_state)),
        "step": np.asarray(state.step),
        "kwargs": {"n_nodes": float(cfg.n_nodes), "c_puct": float(cfg.c_puct)},
    }


def load_state_dict(state: TrainState, sd) -> TrainState:
    opt_def = jax.tree.structure(state.opt_state)
    opt_leaves = [jnp.asarray(x) for x in jax.tree.leaves(sd["opt"])]
    return state.replace(
        params=jax.tree.map(lambda old, new: jnp.asarray(new, old.dtype), state.params, sd["params"]),
        opt_state=jax.tree.unflatten(opt_def, opt_leaves),
        step=jnp.asarray(np.asarray(sd["step"]), jnp.int32),
    )


# --------------------------------------------------------------------------
# Entry point
# --------------------------------------------------------------------------

def run(
    boardsize,
    width,
    depth,
    desc="",
    nodes=64,
    c_puct=1 / 16,
    lr=1e-3,
    n_envs=32 * 1024,
    storer="time",
    max_steps=None,
    resume=None,
    arena=False,
    arena_ladder="rollout",
    n_devices=None,
    **overrides,
):
    """Train an agent (reference main.py:147-200). Returns the run name.

    `max_steps` bounds learner steps (for smoke tests); `resume` continues a
    previous run from its latest checkpoint. `n_devices` > 1 shards the env
    axis over a dp mesh of the first n local devices (params replicate, one
    psum gradient reduction per step — see parallel/mesh.py); the reference
    has no in-run analog (it scales by whole runs per GPU).

    Boardsizes >= 7 default to the batched K=8 multi-leaf search. Equal-budget
    7x7 head-to-head vs K=1 measured 45.9% over 512 games — inside the 2-sigma
    binomial band, though a small (few-Elo) tax can't be excluded at that
    sample size (results/k_parity). It is ~10x faster: the flagship 32k-env
    9x9 train step is 0.637s (51.4k samples/s) vs 6.65s at K=1 (round-4
    numbers, STATUS.md). K=16 searches another ~21% faster but FAILED the
    equal-budget parity study (42.5% over 2048 games, a 6.76-sigma deficit
    — results/k_parity_k16) and is deliberately NOT the default. Pass
    leaves_per_pass=1 for the reference-exact sequential search. K>1 also
    defaults to the triangular grow-passes mode with the padded Pallas walk
    and the prefix-sum backup — distribution-identical to the scan path and
    ~2.3x faster end-to-end (0.2218s vs 0.516s per 64-node search at 16k
    envs, scripts/measure_round5.py).
    """
    if boardsize >= 7:
        overrides.setdefault("leaves_per_pass", 8)
        if overrides["leaves_per_pass"] > 1:
            overrides.setdefault("use_pallas", False)
            overrides.setdefault("grow_passes", True)
    cfg = TrainConfig(
        boardsize=boardsize,
        width=width,
        depth=depth,
        n_envs=n_envs,
        n_nodes=nodes,
        c_puct=c_puct,
        lr=lr,
        **overrides,
    )
    mesh = None
    if n_devices is not None and n_devices > 1:
        from .parallel import make_mesh

        mesh = make_mesh(n_devices)
    model, opt, init, warmup, train_step = make_train(cfg, mesh=mesh)

    state = init(jax.random.PRNGKey(cfg.seed))

    resumed_payload = None
    if resume is not None:
        run_name = runs.resolve(resume)
        resumed_payload = pstorage.load_latest(run_name)
        state = load_state_dict(state, resumed_payload["agent"])
        log.info(f"resumed {run_name} at step {int(state.step)}")
    else:
        run_name = runs.new_run(
            description=desc,
            boardsize=boardsize,
            width=width,
            depth=depth,
            nodes=nodes,
            c_puct=c_puct,
            lr=lr,
            n_envs=n_envs,
        )
        pstorage.save_raw(
            run_name, "model", {"cfg": cfg.__dict__, "kind": "FCModel"}
        )

    if mesh is not None:
        from .parallel import shard_train_state

        state = shard_train_state(state, mesh)
    state = warmup(state)

    flops_per = bstorage.flops_per_sample(state.params, cfg.n_nodes)
    storer_cls = bstorage.TimeStorer if storer == "time" else bstorage.FlopsStorer
    storer = storer_cls(run_name, boardsize, flops_per)
    if resumed_payload is not None:
        # continue the sample/FLOP accounting exactly: seed the counters from
        # the checkpoint payload and skip savepoints the old run already took
        storer.seed(
            n_flops=resumed_payload.get("n_flops", 0.0),
            n_samples=resumed_payload.get("n_samples", 0.0),
            runtime=resumed_payload.get("runtime", 0.0),
        )

    live = None
    if arena:
        from .arena import live as arena_live

        live = arena_live.run(run_name, ladder=arena_ladder)

    try:
        with logs.to_run(run_name), stats.to_run(run_name):
            while True:
                state, aux = train_step(state)
                aux = jax.device_get(aux)
                with stats.defer():
                    for k, v in aux.items():
                        if k.startswith(("loss", "corr", "kl", "rel-entropy", "v.", "policy-conc", "mcts", "noise", "step.", "grad.", "resid")):
                            stats.mean(k, v)
                    # win fractions per finished trajectory (reference main.py:46-49)
                    n_trajs = max(float(aux["n-trajs"]), 1.0)
                    stats.mean("wins.seat-0", aux["wins.seat-0"], n_trajs)
                    stats.mean("wins.seat-1", aux["wins.seat-1"], n_trajs)
                    stats.rate("sample-rate.actor", cfg.n_envs)
                    stats.rate("step-rate.learner", 1)
                    stats.cumsum("count.samples", cfg.n_envs)
                    stats.mean("n-trajs", aux["n-trajs"])
                pdevice.device(15)  # reference stats.gpu(device, 15), main.py:190
                log.info(f"step {int(state.step)}")

                finished = storer.step(state_dict(state, cfg), cfg.n_envs)
                if max_steps is not None and int(state.step) >= max_steps:
                    finished = True
                if finished:
                    # full payload (incl. n_flops/n_samples/runtime) so a
                    # resumed run continues the accounting exactly
                    pstorage.save_latest(run_name, storer.payload(state_dict(state, cfg)))
                    break
    finally:
        if live is not None:
            live.terminate()

    log.info("Finished")
    return run_name


def run_best(boardsize, **kwargs):
    """Train with the best-known hyperparameters for a boardsize."""
    row = BEST.set_index("boardsize").loc[boardsize]
    return run(
        boardsize,
        int(row.width),
        int(row.depth),
        nodes=int(row.nodes),
        c_puct=float(row.c_puct),
        **kwargs,
    )
