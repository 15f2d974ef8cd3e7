"""Exact perfect-play anchoring for small boards.

Reference counterpart: boardlaw/arena/mohex.py — the reference anchors its
Elo scale to "perfect play" by labelling every distinct 2-ply opening with
MoHex-vs-MoHex winners (mohex.py:41-58) and measuring agents against MoHex
(:71-106). MoHex's binary is environment-gated here, but small boards are
EXACTLY solvable: this module provides a memoized minimax oracle built on
the repo's own Hex env (so env semantics and oracle agree by construction),
the exact analog of the reference's opening labels, and a PerfectAgent that
plugs into arena.common.evaluate — giving a TRUE perfect-play anchor where
the reference itself only approximates one.

Solved-size guidance: 3x3 solves in seconds (~4k reachable states); 4x4
solves in a few minutes with the alpha-beta cut. Beyond that use MoHex when
available (arena/mohex_calibration.py).
"""
from __future__ import annotations

import json
from functools import partial
from logging import getLogger
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import hex

log = getLogger(__name__)

DATA = Path("output/experiments/perfect")


class Solver:
    """Memoized exact minimax over Hex states, one env.step batch per state.

    `value(board, seat)` returns +1 if the player to move wins with perfect
    play, -1 otherwise (Hex has no draws). `action_values` gives the exact
    value of every legal move. All game dynamics come from the jitted env
    (one (A,)-batched step expands every action of a state at once), so the
    oracle cannot diverge from the environment it anchors.
    """

    def __init__(self, boardsize=3):
        self.boardsize = boardsize
        self.A = boardsize * boardsize
        self._memo = {}
        self._expand = jax.jit(self._expand_impl)

    def _expand_impl(self, board, seat):
        A = self.A
        world = hex.Hex(
            board=jnp.broadcast_to(board[None], (A,) + board.shape),
            seats=jnp.full((A,), seat, jnp.int32),
        )
        new, tr = world.step(jnp.arange(A, dtype=jnp.int32))
        # the valid mask comes from the env, NOT `board == 0` flattened:
        # actions are in the ACTING player's frame, which is transposed for
        # seat 1 (hex.Hex.valid / OpenSpiel convention)
        return world.valid[0], new.board, new.seats, tr.terminal, tr.rewards

    def action_values(self, board, seat, alpha_beta=True):
        """Exact value per legal action (mover-frame indices, transposed for
        seat 1) from the MOVER's perspective -> (A,) float, NaN at illegal
        actions."""
        board = np.asarray(board, np.uint8)
        seat = int(seat)
        valid, boards, seats, term, rew = (np.asarray(x) for x in self._expand(
            jnp.asarray(board), seat))
        vals = np.full(self.A, np.nan, np.float32)
        order = np.flatnonzero(valid)
        best = -2.0
        for a in order:
            if term[a]:
                # in Hex a move can only complete the mover's own connection
                v = 1.0 if rew[a, seat] == 1 else -1.0
            else:
                v = -self.value(boards[a], int(seats[a]))
            vals[a] = v
            best = max(best, v)
            if alpha_beta and v == 1.0:
                # a winning move suffices for the parent's max; remaining
                # siblings stay NaN (callers that need the full vector pass
                # alpha_beta=False)
                break
        return vals

    def value(self, board, seat):
        board = np.asarray(board, np.uint8)
        key = (board.tobytes(), int(seat))
        if key in self._memo:
            return self._memo[key]
        vals = self.action_values(board, seat, alpha_beta=True)
        v = float(np.nanmax(vals))
        self._memo[key] = v
        return v

    def optimal_actions(self, board, seat):
        """All exactly-optimal moves (indices)."""
        vals = self.action_values(board, seat, alpha_beta=False)
        best = np.nanmax(vals)
        return np.flatnonzero(vals == best)

    def states_solved(self):
        return len(self._memo)


class PerfectAgent:
    """Agent-protocol wrapper over the exact solver (host-side, like the
    GTP agents): plays a uniformly-random EXACTLY-OPTIMAL move, so repeated
    games vary while never conceding value."""

    def __init__(self, solver: Solver, seed=0):
        self.solver = solver
        self.rng = np.random.default_rng(seed)

    def __call__(self, world, key=None, eval=False):
        boards = np.asarray(world.board)
        seats = np.asarray(world.seats)
        B = boards.shape[0]
        A = self.solver.A
        actions = np.zeros(B, np.int32)
        logits = np.full((B, A), -np.inf, np.float32)
        values = np.zeros((B, world.n_seats), np.float32)
        for b in range(B):
            if (boards[b] != 0).all():
                continue  # finished board (frozen env); any action is unused
            opts = self.solver.optimal_actions(boards[b], seats[b])
            actions[b] = self.rng.choice(opts)
            logits[b, opts] = -np.log(len(opts))
            v = self.solver.value(boards[b], seats[b])
            values[b, seats[b] % world.n_seats] = v
            values[b, (seats[b] + 1) % world.n_seats] = -v
        return {
            "actions": jnp.asarray(actions),
            "logits": jnp.asarray(logits),
            "v": jnp.asarray(values),
        }


def exact_opening_wins(boardsize=3, cache=True):
    """The reference's opening labels (arena/mohex.py:41-58) with a TRUE
    oracle: for every distinct 2-ply opening, the EXACT winning seat under
    perfect play. Returns (winners (N,) int array, openings world)."""
    from .mohex_calibration import initial_states

    path = DATA / f"openings_b{boardsize}.json"
    world = initial_states(boardsize)
    if cache and path.exists():
        return np.asarray(json.loads(path.read_text()), int), world

    solver = Solver(boardsize)
    boards = np.asarray(world.board)
    seats = np.asarray(world.seats)
    winners = np.empty(world.n_envs, int)
    for i in range(world.n_envs):
        v = solver.value(boards[i], seats[i])
        mover = int(seats[i])
        winners[i] = mover if v > 0 else 1 - mover
    if cache:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps([int(w) for w in winners]))
    log.info(f"solved {solver.states_solved()} states for b{boardsize} openings")
    return winners, world


def calibrate_exact(agent, boardsize=3, n_envs=64, key=None):
    """True perfect-play winrate of an agent: both seat orders from the
    empty board (the reference's calibrate, arena/mohex.py:71-106, with the
    exact oracle standing in for MoHex). Returns the evaluate() results plus
    the aggregate winrate."""
    from . import common

    solver = Solver(boardsize)
    world = hex.Hex.initial(n_envs, boardsize)
    results = common.evaluate(
        world, {"agent": agent, "perfect": PerfectAgent(solver)},
        key=key if key is not None else jax.random.PRNGKey(0))
    wins = games = 0.0
    for r in results:
        for name, w in zip(r["names"], r["wins"]):
            if name == "agent":
                wins += w
        games += r["games"]
    return {"results": results, "winrate": wins / max(games, 1.0),
            "games": games}
