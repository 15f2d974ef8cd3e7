"""Rollout and recording helpers for analysis and demos.

Reference counterpart: boardlaw/analysis.py — the multi-agent seat-masked
rollout driver returning a stacked trace (analysis.py:47-87), ragged-mask
decision reassembly (:27-45), and board-video recording (:108-117).

JAX note: every agent acts on the full static-shaped batch each ply and the
per-seat owner's action is selected with a where — no dynamic sub-batching.
"""
from __future__ import annotations

from logging import getLogger

import jax
import jax.numpy as jnp
import numpy as np

from . import utils
from .utils import recording

log = getLogger(__name__)


def rollout(world, agents, key=None, n_steps=None, n_trajs=None, n_reps=None, **kwargs):
    """Play `agents` (one per seat) until the requested number of steps /
    finished trajectories / per-env repeats. Returns a dict trace with leaves
    stacked on a leading time axis:

      actions (T, B), transitions, worlds, and per-agent decisions with
      per-step ownership masks (reference analysis.py:47-87).
    """
    assert sum(x is not None for x in (n_steps, n_trajs, n_reps)) == 1, (
        "Specify exactly one of n_steps, n_trajs, n_reps"
    )
    key = key if key is not None else jax.random.PRNGKey(0)
    B = world.n_envs

    trace = []
    dtrace = []
    steps, trajs = 0, 0
    reps = np.zeros(B)

    while True:
        seats = np.asarray(world.seats)
        decisions, masks = {}, {}
        actions = jnp.zeros((B,), jnp.int32)
        for i, agent in enumerate(agents):
            mask = seats == i
            if not mask.any():
                continue
            key, sub = jax.random.split(key)
            d = agent(world, sub, **kwargs)
            decisions[i] = d
            masks[i] = mask
            actions = jnp.where(jnp.asarray(mask), d["actions"], actions)

        world, transitions = world.step(actions)
        trace.append(
            {"actions": actions, "transitions": transitions, "worlds": world}
        )
        dtrace.append({i: {**decisions[i], "mask": masks[i]} for i in decisions})

        steps += 1
        if n_steps and steps >= n_steps:
            break
        trajs += int(np.asarray(transitions.terminal).sum())
        if n_trajs and trajs >= n_trajs:
            break
        reps += np.asarray(transitions.terminal)
        if n_reps and (reps >= n_reps).all():
            break

    out = utils.stack(trace)
    out["decisions"] = combine_decisions(dtrace, B)
    return out


def _expand(exemplar, B):
    """A default-filled full-batch version of a masked decision leaf
    (reference analysis.py:17-25)."""
    x = np.asarray(exemplar)
    if np.issubdtype(x.dtype, np.floating):
        default = np.nan
    else:
        default = -1
    return np.full((B,) + x.shape[1:], default, x.dtype)


def combine_decisions(dtrace, B):
    """Reassemble ragged per-agent decisions into dense (T, B, ...) arrays
    with validity masks (reference analysis.py:27-45)."""
    agents = {a for d in dtrace for a in d}
    results = {}
    for a in agents:
        exemplar = next(d[a] for d in dtrace if a in d)
        steps = []
        for d in dtrace:
            expanded = {
                k: _expand(v, B) for k, v in exemplar.items() if k != "mask"
            }
            if a in d:
                mask = np.asarray(d[a]["mask"])
                for k in expanded:
                    expanded[k][mask] = np.asarray(d[a][k])[mask]
                expanded["mask"] = mask
            else:
                expanded["mask"] = np.zeros(B, bool)
            steps.append(expanded)
        results[str(a)] = {
            k: np.stack([s[k] for s in steps]) for k in steps[0]
        }
    return results


def record_worlds(worlds_trace, n_envs=4, fps=1):
    """Render a (T, B, ...) hex world trace to a video (reference
    analysis.py:108-113)."""
    from .envs import hex

    boards = np.asarray(worlds_trace.board)[:, :n_envs]

    def frame(t):
        import matplotlib.pyplot as plt

        n = boards.shape[1]
        fig, axes = plt.subplots(1, n, squeeze=False)
        for e in range(n):
            colors = hex.color_board(boards[t, e])
            hex.plot_board(colors, ax=axes[0, e])
        return fig

    with recording.Encoder(fps=fps) as enc:
        for t in range(boards.shape[0]):
            enc(frame(t))
    return enc


def record(world, agents, n_envs=4, key=None, **kwargs):
    """Roll out a game and record it (reference analysis.py:115-117)."""
    trace = rollout(world, agents, key=key, **kwargs)
    return record_worlds(trace["worlds"], n_envs=n_envs)
