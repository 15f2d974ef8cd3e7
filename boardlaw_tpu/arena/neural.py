"""League evaluation: all pairs of a league play simultaneously over one giant
env array.

Reference counterpart: boardlaw/arena/neural.py — a `Tracker` keeps a
remaining-games ledger per matchup and maps each env to a live matchup
(neural.py:46-100); a `ChunkEvaluator` steps the shared env array with one
chosen agent at a time, scatter-collecting results as games finish
(neural.py:102-191).
"""
from __future__ import annotations

import time
from logging import getLogger

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .. import utils
from ..envs import hex

log = getLogger(__name__)


class Tracker:
    """Ledger of which envs are playing which (black, white) matchup and how
    many games each matchup still needs (reference neural.py:46-100)."""

    def __init__(self, n_envs, matchups, n_envs_per):
        self.n_envs = n_envs
        self.matchups = list(matchups)  # list of (black, white) name pairs
        self.remaining = {m: n_envs_per for m in self.matchups}
        self.live = np.full(n_envs, -1)  # env -> matchup index, -1 free

    def refill(self):
        """Assign free envs to the matchups with the most backlog. Returns the
        env indices that were (re)assigned (they need resetting)."""
        free = np.flatnonzero(self.live == -1)
        assigned = []
        for e in free:
            backlog = {
                i: self.remaining[m] - (self.live == i).sum()
                for i, m in enumerate(self.matchups)
                if self.remaining[m] > (self.live == i).sum()
            }
            if not backlog:
                break
            i = max(backlog, key=backlog.get)
            self.live[e] = i
            assigned.append(e)
        return np.array(assigned, int)

    def suggest(self, seats):
        """The (agent name, env mask) owning the most live envs' current
        seats (reference neural.py:76-100)."""
        seats = np.asarray(seats)
        owners = {}
        for e in np.flatnonzero(self.live >= 0):
            pair = self.matchups[self.live[e]]
            name = pair[seats[e]]
            owners.setdefault(name, []).append(e)
        if not owners:
            return None, np.zeros(self.n_envs, bool)
        name = max(owners, key=lambda k: len(owners[k]))
        mask = np.zeros(self.n_envs, bool)
        mask[owners[name]] = True
        return name, mask

    def finish(self, env_idxs):
        """Mark games finished; returns the matchup of each env and frees it."""
        out = []
        for e in env_idxs:
            i = self.live[e]
            if i < 0:
                continue
            m = self.matchups[i]
            self.remaining[m] = max(self.remaining[m] - 1, 0)
            self.live[e] = -1
            out.append(m)
        return out

    @property
    def finished(self):
        return all(v == 0 for v in self.remaining.values()) and (self.live == -1).all()


class ChunkEvaluator:
    """Plays every matchup of a league over one shared env array, one agent
    acting per step (reference neural.py:102-191).

    agents: dict name -> agent protocol callable.
    """

    def __init__(self, boardsize, n_envs, agents, matchups, n_envs_per, seed=0):
        self.agents = agents
        self.world = hex.Hex.initial(n_envs, boardsize)
        self.tracker = Tracker(n_envs, matchups, n_envs_per)
        self.key = jax.random.PRNGKey(seed)
        # wins[env] per seat for the current game of each env
        self.wins = np.zeros((n_envs, 2))
        self.moves = 0
        self.games = 0
        self.start = time.time()

    def step(self):
        """One acting step; returns list of completed-matchup records
        ((black, white), black_win, white_win)."""
        fresh = self.tracker.refill()
        if len(fresh):
            # reset fresh envs to the initial board
            mask = np.zeros(self.tracker.n_envs, bool)
            mask[fresh] = True
            initial = hex.Hex.initial(self.tracker.n_envs, self.world.boardsize)
            self.world = utils.where(jnp.asarray(mask), initial, self.world)
            self.wins[fresh] = 0

        name, mask = self.tracker.suggest(np.asarray(self.world.seats))
        if name is None:
            return []

        self.key, sub = jax.random.split(self.key)
        decisions = self.agents[name](self.world, sub, eval=True)
        stepped, transition = self.world.step(decisions["actions"])
        self.world = utils.where(jnp.asarray(mask), stepped, self.world)

        terminal = np.asarray(transition.terminal) & mask
        rewards = np.asarray(transition.rewards)
        self.moves += int(mask.sum())

        results = []
        if terminal.any():
            winners = rewards[terminal] == 1
            idxs = np.flatnonzero(terminal)
            pairs = []
            for k, e in enumerate(idxs):
                i = self.tracker.live[e]
                if i < 0:
                    continue
                pairs.append((self.tracker.matchups[i], winners[k]))
            self.tracker.finish(idxs)
            for (black, white), win in pairs:
                results.append(((black, white), float(win[0]), float(win[1])))
                self.games += 1
        return results

    def play(self, progress_every=60):
        """Run to completion; returns a trials DataFrame (black_agent,
        white_agent, black_wins, white_wins)."""
        records = {}
        last = time.time()
        while not self.tracker.finished:
            for (black, white), bw, ww in self.step():
                key = (black, white)
                rec = records.setdefault(key, [0.0, 0.0])
                rec[0] += bw
                rec[1] += ww
            if time.time() - last > progress_every:
                last = time.time()
                done = sum(v for v in records.values() for v in v)
                log.info(
                    f"league: {done:.0f} games done, "
                    f"{self.moves / (time.time() - self.start):.0f} moves/s"
                )
        rows = [
            {"black_agent": b, "white_agent": w, "black_wins": bw, "white_wins": ww}
            for (b, w), (bw, ww) in records.items()
        ]
        return pd.DataFrame(rows)


def all_matchups(names):
    return [(b, w) for b in names for w in names if b != w]


def evaluate(boardsize, agents, n_envs_per=4, n_envs=None, seed=0):
    """Round-robin league over all ordered pairs (reference
    neural.py:229-294's evaluate, single-process)."""
    names = list(agents)
    matchups = all_matchups(names)
    n_envs = n_envs or min(len(matchups) * n_envs_per, 1024)
    n_envs = max(n_envs - n_envs % 2, 2)
    ev = ChunkEvaluator(boardsize, n_envs, agents, matchups, n_envs_per, seed)
    return ev.play()


# --------------------------------------------------------------------------
# League farm-out: chunk jobs over a worker pool (reference neural.py:229-313)
# --------------------------------------------------------------------------

def max_envs(boardsize, n_nodes=64, memory_bytes=2 * 1024**3, safety=0.5):
    """Memory-aware env-count cap for one evaluation job: each env's search
    tree holds n_nodes rows of (A logits + A n_edge + A w_edge + A children)
    f32 plus the per-node worlds — the TPU analog of the reference's
    GPU-memory-aware chunk sizing (neural.py:296-313)."""
    A = boardsize**2
    per_env = n_nodes * (A * 16 + A + boardsize**2 + 64)
    return max(int(memory_bytes * safety / per_env) // 2 * 2, 2)


def chunk_jobs(specs, chunk_size):
    """Split the agents x agents games matrix into diagonal chunks (round
    robin inside one group) and skew chunks (all cross pairs of two groups) —
    the reference's decomposition (neural.py:229-274). Each job touches at
    most 2*chunk_size agents, bounding per-worker memory."""
    names = list(specs)
    groups = [names[i : i + chunk_size] for i in range(0, len(names), chunk_size)]
    jobs = []
    for i, g in enumerate(groups):
        diag = all_matchups(g)
        if diag:
            jobs.append(({n: specs[n] for n in g}, diag))
        for h in groups[i + 1 :]:
            skew = [(b, w) for b in g for w in h] + [(b, w) for b in h for w in g]
            jobs.append(({n: specs[n] for n in g + h}, skew))
    return jobs


def _run_chunk(args):
    """One farm-out job: build the agents from their picklable specs and play
    the chunk's matchups to completion. Module-level so it pickles."""
    boardsize, specs, loader, matchups, n_envs_per, n_envs, seed = args
    agents = {name: loader(spec) for name, spec in specs.items()}
    ev = ChunkEvaluator(boardsize, n_envs, agents, matchups, n_envs_per, seed)
    return ev.play()


def run_agent_loader(spec):
    """Default loader: spec = (run, snapshot-idx or None) loaded from run
    storage (the reference loads chunk agents from SQL, neural.py:243-254)."""
    from . import common

    run, idx = spec
    return common.agent(run, idx)


def evaluate_gen(boardsize, specs, loader=run_agent_loader, n_envs_per=4,
                 chunk_size=8, n_envs=None, memory_bytes=2 * 1024**3, seed=0):
    """Generate the chunk-job argument tuples for a league over `specs`
    (dict name -> picklable spec)."""
    for k, (chunk_specs, matchups) in enumerate(chunk_jobs(specs, chunk_size)):
        envs = n_envs or min(
            len(matchups) * n_envs_per, max_envs(boardsize, memory_bytes=memory_bytes)
        )
        envs = max(envs - envs % 2, 2)
        yield (boardsize, chunk_specs, loader, matchups, n_envs_per, envs, seed + k)


def evaluate_parallel(boardsize, specs, loader=run_agent_loader, n_envs_per=4,
                      chunk_size=8, n_envs=None, memory_bytes=2 * 1024**3,
                      kind="device", max_workers=2, seed=0):
    """Farm the league's chunk jobs over a worker pool and merge the trials
    (reference neural.py:256-274 used a 2-worker CUDA pool; here workers are
    platform-pinned processes — CPU by default so they never contend for the
    training chip)."""
    from ..utils import parallel as upar

    job_args = list(evaluate_gen(
        boardsize, specs, loader, n_envs_per, chunk_size, n_envs, memory_bytes, seed
    ))
    start = time.time()
    frames = upar.parallel(_run_chunk, job_args, kind=kind, max_workers=max_workers)
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["black_agent", "white_agent", "black_wins", "white_wins"]
    )
    out = out.groupby(["black_agent", "white_agent"], as_index=False).sum()
    games = (out.black_wins + out.white_wins).sum() if len(out) else 0
    dt = time.time() - start
    log.info(
        f"league farm-out: {len(job_args)} jobs, {games:.0f} games in {dt:.1f}s "
        f"({games / max(dt, 1e-9):.1f} games/s)"
    )
    return out


class MockAgent:
    """Plays its own id every time (reference neural.py:341-358)."""

    def __init__(self, action):
        self.action = action

    def __call__(self, world, key, eval=False):
        B = world.n_envs
        return {"actions": jnp.full((B,), self.action, jnp.int32)}
