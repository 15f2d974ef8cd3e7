"""Vectorized Hex, TPU-native.

Reference counterpart: boardlaw/hex/__init__.py + boardlaw/hex/cpp/{cpu.cpp,cuda.cu}.

The reference's key insight is kept (hex/cpp/cuda.cu:8-16): the board itself
stores *edge-connectivity labels*. Cells are one of

    EMPTY, BLACK, WHITE, TOP, BOT, LEFT, RIGHT

where TOP/BOT mark black groups connected to the top/bottom edge and
LEFT/RIGHT mark white groups connected to the left/right edge. A move then
only needs to inspect its 6 hex neighbours to detect a win (both own edges
adjacent), and relabel the just-placed group — O(neighbourhood) win detection.

Where the reference walks a BFS queue per env in CUDA (one thread per board,
hex/cpp/cuda.cu:18-74), here the flood is a *batched masked dilation* under a
single `lax.while_loop`: all envs flood in lockstep as (B,S,S) boolean VPU ops,
iterating until no env's frontier grows. No host round-trips, no per-env
control flow — the whole `step` is one fused XLA program.

Seat frames: white sees the board transposed (both players "connect
top-to-bottom" in their own frame), so white's actions and observations are
mirrored exactly as in the reference (hex/cpp/cpu.cpp:83, :169-183).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from .base import Masked, Tensor, Transition
from .. import utils

EMPTY, BLACK, WHITE, TOP, BOT, LEFT, RIGHT = range(7)

CHARS = ".bwTBLR"
ORDS = {c: i for i, c in enumerate(CHARS)}

# The six hex-grid neighbour offsets (row, col) — hex/cpp/cpu.cpp:18.
NEIGHBOURS = ((-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0))

# Cell labels owned by each colour: black groups may be BLACK/TOP/BOT,
# white groups WHITE/LEFT/RIGHT (hex/cpp/cpu.cpp:156-162).
_COLORMAP = np.full(7, 2, dtype=np.uint8)
_COLORMAP[[BLACK, TOP, BOT]] = 0
_COLORMAP[[WHITE, LEFT, RIGHT]] = 1


def _padded_with_edges(board):
    """Board padded by one ring of virtual edge-label cells: the top/bottom
    rows are TOP/BOT and the side columns LEFT/RIGHT. Corner precedence
    follows the reference's r<0 -> TOP, r>=S -> BOT checks coming before the
    column checks (hex/cpp/cpu.cpp:94-103): the two reachable corners (via
    the (-1,+1) and (+1,-1) hex offsets) must read TOP and BOT, so the
    TOP/BOT rows span the full padded width."""
    B, S, _ = board.shape
    p = jnp.pad(board, ((0, 0), (1, 1), (1, 1)))
    p = p.at[:, :, 0].set(LEFT).at[:, :, -1].set(RIGHT)
    p = p.at[:, 0, :].set(TOP).at[:, -1, :].set(BOT)
    return p


def _neighbour_values(board, pos):
    """Values of the 6 neighbours of the one-hot cell `pos` per env, with
    virtual edge labels for off-board neighbours (hex/cpp/cpu.cpp:94-103).

    board: (B, S, S) uint8; pos: (B, S, S) bool one-hot. Returns (B, 6) i32.

    TPU formulation: no per-env gathers — each neighbour is a static slice of
    the edge-padded board masked by `pos` and lane-reduced, so the whole read
    is 6 fused (B,S,S) vector reductions.
    """
    S = board.shape[-1]
    p = _padded_with_edges(board).astype(jnp.int32)
    vals = []
    for dr, dc in NEIGHBOURS:
        shifted = p[:, 1 + dr : 1 + dr + S, 1 + dc : 1 + dc + S]
        vals.append(jnp.where(pos, shifted, 0).sum((1, 2)))
    return jnp.stack(vals, -1)


def _dilate(frontier):
    """One step of 6-neighbour hex dilation of a (B, S, S) boolean mask."""
    p = jnp.pad(frontier, ((0, 0), (1, 1), (1, 1)))
    out = frontier
    for dr, dc in NEIGHBOURS:
        # A cell is reached if its (dr,dc)-neighbour is in the frontier.
        out = out | p[:, 1 - dr : p.shape[1] - 1 - dr, 1 - dc : p.shape[2] - 1 - dc]
    return out


def _flood(board, pos, stone, new_val):
    """Relabel the same-coloured connected group containing the one-hot cell
    ``pos`` with ``new_val`` wherever ``new_val`` is an edge label (>= TOP);
    no-op envs keep their board (hex/cpp/cpu.cpp:15-68, batched).

    board: (B,S,S) uint8 with the stone already placed at ``pos``.

    Perf notes (chip-measured): the flood is seeded ONLY in envs that
    actually relabel (new_val >= TOP) — most mid-game placements don't touch
    an edge group, so the lockstep iteration count tracks the groups being
    relabelled, not every placement. Each while iteration runs 4 dilations
    per convergence check: the check is a global reduction that serialises
    the loop, so checking every step pays 4x the latency for at most 3
    wasted (trivially cheap) dilations.
    """
    B, S, _ = board.shape
    own = board == stone[:, None, None]
    active = (new_val >= TOP)[:, None, None]

    seed = pos & active

    def cond(carry):
        frontier, grew = carry
        return grew

    def step(carry):
        frontier, _ = carry
        nxt = frontier
        for _ in range(4):
            nxt = _dilate(nxt) & own
        grew = (nxt != frontier).any()
        return nxt, grew

    frontier, _ = jax.lax.while_loop(cond, step, (seed, seed.any()))
    return jnp.where(frontier & active, new_val[:, None, None].astype(board.dtype), board)


def _step_boards(board, seats, actions):
    """Core transition: place a stone, detect wins, flood edge labels.

    board: (B,S,S) uint8; seats: (B,) int; actions: (B,) int flat indices in
    the *acting player's frame*. Returns (new_board, rewards (B,2) f32).

    Mirrors hex/cpp/cpu.cpp:70-130 exactly (behaviour, not structure).
    """
    S = board.shape[-1]
    B = board.shape[0]
    seats = seats.astype(jnp.int32)
    actions = actions.astype(jnp.int32)

    # White plays in the transposed frame.
    row = jnp.where(seats == 0, actions // S, actions % S)
    col = jnp.where(seats == 0, actions % S, actions // S)

    # one-hot placement mask — every read/write below is a masked vector op
    # on (B,S,S), never a per-env varying-index gather/scatter (those lower
    # ~10x worse on TPU)
    iota = jnp.arange(S)
    pos = (iota[None, :, None] == row[:, None, None]) & (
        iota[None, None, :] == col[:, None, None]
    )

    nv = _neighbour_values(board, pos)
    adj_top = (nv == TOP).any(-1)
    adj_bot = (nv == BOT).any(-1)
    adj_left = (nv == LEFT).any(-1)
    adj_right = (nv == RIGHT).any(-1)

    black = seats == 0
    win = jnp.where(black, adj_top & adj_bot, adj_left & adj_right)
    black_reward = jnp.where(black, 1.0, -1.0) * win
    rewards = jnp.stack([black_reward, -black_reward], -1).astype(jnp.float32)

    new_val = jnp.where(
        black,
        jnp.where(adj_top, TOP, jnp.where(adj_bot, BOT, BLACK)),
        jnp.where(adj_left, LEFT, jnp.where(adj_right, RIGHT, WHITE)),
    ).astype(board.dtype)

    stone = jnp.where(black, BLACK, WHITE).astype(board.dtype)
    board = jnp.where(pos, stone[:, None, None], board)
    board = _flood(board, pos, stone, new_val)
    return board, rewards


def _observe(board, seats):
    """Render (B,S,S,2) float one-hot planes in the current player's frame:
    plane 0 = current player's stones, plane 1 = opponent's. White sees the
    transposed board with planes swapped (hex/cpp/cpu.cpp:145-183)."""
    colors = jnp.asarray(_COLORMAP)[board]  # (B,S,S) in {0,1,2}
    flip = (seats == 1)[:, None, None]
    sel = jnp.where(flip, jnp.swapaxes(colors, -1, -2), colors)
    own = jnp.where(flip, sel == 1, sel == 0)
    opp = jnp.where(flip, sel == 0, sel == 1)
    return jnp.stack([own, opp], -1).astype(jnp.float32)


class Hex(struct.PyTreeNode):
    """Two-player Hex world. Black (seat 0) connects top-bottom; white
    (seat 1) connects left-right; black moves first (as per OpenSpiel
    convention, reference hex/__init__.py:124)."""

    board: jnp.ndarray  # (n_envs, S, S) uint8 cell labels
    seats: jnp.ndarray  # (n_envs,) int32 current seat per env

    @classmethod
    def initial(cls, n_envs, boardsize=11):
        return cls(
            board=jnp.zeros((n_envs, boardsize, boardsize), jnp.uint8),
            seats=jnp.zeros((n_envs,), jnp.int32),
        )

    # -- static metadata ---------------------------------------------------
    @property
    def n_envs(self):
        return self.board.shape[0]

    @property
    def boardsize(self):
        return self.board.shape[-1]

    @property
    def n_seats(self):
        return 2

    @property
    def obs_space(self):
        return Tensor((self.boardsize, self.boardsize, 2))

    @property
    def action_space(self):
        return Masked(self.boardsize * self.boardsize)

    # -- observations ------------------------------------------------------
    @property
    def obs(self):
        return _observe(self.board, self.seats)

    @property
    def valid(self):
        # A cell is playable iff empty; in the acting player's frame
        # (reference computes this from obs, hex/__init__.py:155-159).
        empty = self.board == EMPTY
        flip = (self.seats == 1)[:, None, None]
        sel = jnp.where(flip, jnp.swapaxes(empty, -1, -2), empty)
        return sel.reshape(self.n_envs, -1)

    # -- dynamics ----------------------------------------------------------
    def step(self, actions, reset=True):
        """Step every env with a flat action in the acting player's frame.
        Terminal envs are auto-reset (board cleared, black to move) and
        flagged in the returned Transition (hex/__init__.py:161-195).

        actions may also be (n_envs, 2) row/col pairs.
        """
        if actions.ndim == 2:
            actions = actions[:, 0] * self.boardsize + actions[:, 1]

        new_board, rewards = _step_boards(self.board, self.seats, actions)
        terminal = (rewards > 0).any(-1) if reset else jnp.zeros((self.n_envs,), bool)

        new_board = jnp.where(terminal[:, None, None], jnp.uint8(EMPTY), new_board)
        new_seats = jnp.where(terminal, 0, 1 - self.seats).astype(self.seats.dtype)

        world = self.replace(board=new_board, seats=new_seats)
        return world, Transition(terminal=terminal, rewards=rewards)

    # -- display -----------------------------------------------------------
    def render(self, e=0):
        """ASCII board: '.' empty, 'b/w' stones, 'T/B/L/R' edge-labelled."""
        rows = np.asarray(self.board[e])
        return "\n".join("".join(CHARS[v] for v in row) for row in rows)


class Solitaire(Hex):
    """One-player Hex: the opponent is auto-played by `_play` after every
    move until it's the protagonist's turn again (hex/__init__.py:224-253)."""

    @classmethod
    def initial(cls, n_envs, boardsize=11, seat=0):
        if seat == 1:
            raise ValueError("seat #1 is not supported")
        return super().initial(n_envs, boardsize)

    @property
    def n_seats(self):
        return 1

    def _play(self, world, key):
        raise NotImplementedError

    def step(self, actions, key=None):
        world, transition = Hex.step(self, actions)
        rewards = transition.rewards
        terminal = transition.terminal

        # The opponent's turn comes up exactly when the protagonist's move did
        # not end the game (auto-reset returns the seat to the protagonist).
        stepped, tr = self._play(world, key)
        needs = world.seats != self.seats
        world = utils.where(needs, stepped, world)
        rewards = rewards + jnp.where(needs[:, None], tr.rewards, 0.0)
        terminal = terminal | (needs & tr.terminal)
        envs = jnp.arange(self.n_envs)
        my_rewards = rewards[envs, self.seats][:, None]
        return world, Transition(terminal=terminal, rewards=my_rewards)


class Lazy(Solitaire):
    """Opponent plays the first available action (hex/__init__.py:255-263)."""

    def _play(self, world, key):
        valid = world.valid
        n_actions = valid.shape[1]
        idx = jnp.where(valid, jnp.arange(n_actions)[None, :], n_actions)
        return Hex.step(world, idx.min(-1))


class Random(Solitaire):
    """Opponent plays a uniform random valid action (hex/__init__.py:265-271)."""

    def _play(self, world, key):
        if key is None:
            raise TypeError(
                "Random.step needs a PRNG key: world.step(actions, key=k)"
            )
        logits = jnp.where(world.valid, 0.0, -jnp.inf)
        actions = jax.random.categorical(key, logits, axis=-1)
        return Hex.step(world, actions)


# -- display ---------------------------------------------------------------

def color_board(board, colors="obs"):
    """Map cell labels to RGB (reference hex/__init__.py:12-22): by piece
    colour ('obs') or with edge labels tinted ('board')."""
    import matplotlib as mpl

    black = (0, 0, 0.4)
    white = (0, 0, 0.8)
    tan = (0.07, 0.4, 0.8)
    if colors == "obs":
        hsv = [tan, black, white, black, black, white, white]
    elif colors == "board":
        hsv = [tan, black, white, (0.16, 0.2, 0.4), (0.33, 0.2, 0.4), (0.66, 0.2, 0.8), (0.72, 0.2, 0.8)]
    else:
        raise ValueError(colors)
    rgb = np.stack([mpl.colors.hsv_to_rgb(c) for c in hsv])
    return rgb[np.asarray(board)]


def plot_board(colors, ax=None):
    """Draw a hex board from an (S, S, 3) colour array (reference
    hex/__init__.py:86-118, simplified: hexagon patches on offset rows)."""
    import matplotlib.pyplot as plt
    import matplotlib as mpl

    ax = plt.subplots()[1] if ax is None else ax
    ax.set_aspect(1)
    S = colors.shape[0]
    sin60 = np.sin(np.pi / 3)
    radius = 0.5 / sin60

    for r in range(S):
        for c in range(S):
            x = c + 0.5 * r
            y = sin60 * (S - 1 - r)
            patch = mpl.patches.RegularPolygon(
                (x, y), numVertices=6, radius=radius,
                facecolor=colors[r, c], edgecolor="k", linewidth=1,
            )
            ax.add_patch(patch)

    ax.set_xlim(-1, 1.5 * S)
    ax.set_ylim(-1, sin60 * S + 1)
    ax.set_frame_on(False)
    ax.set_xticks([])
    ax.set_yticks([])
    return ax


def plot_worlds(world, e=0, ax=None, colors="obs"):
    return plot_board(color_board(np.asarray(world.board[e]), colors), ax=ax)


# -- test/analysis helpers -------------------------------------------------

def board_size(s):
    return len(_strip(s).splitlines())


def _strip(s):
    return "\n".join(l.strip() for l in s.splitlines() if l.strip())


def board_actions(s):
    """Recover an alternating black/white action sequence from an ASCII board
    of 'b'/'w'/'.' cells (reference hex/tests.py:96-119). White's actions are
    emitted in white's (transposed) frame."""
    size = board_size(s)
    grid = np.array([list(l) for l in _strip(s).splitlines()])
    bs = np.argwhere(grid == "b")
    ws = np.argwhere(grid == "w")
    assert len(bs) - len(ws) in {0, 1}

    actions = []
    for i in range(len(ws)):
        actions.append([bs[i, 0], bs[i, 1]])
        actions.append([ws[i, 1], ws[i, 0]])
    if len(ws) < len(bs):
        actions.append([bs[-1, 0], bs[-1, 1]])
    return np.array(actions, dtype=np.int32)


def from_string(s):
    """Build a 1-env world by replaying the moves of an ASCII board."""
    world = Hex.initial(n_envs=1, boardsize=board_size(s))
    step = jax.jit(lambda w, a: w.step(a))
    for a in board_actions(s):
        world, _ = step(world, jnp.asarray(a)[None])
    return world
