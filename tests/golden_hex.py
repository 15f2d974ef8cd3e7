"""An independent, trusted-by-inspection Hex implementation for golden tests.

Deliberately written *differently* from boardlaw_tpu.envs.hex: plain python,
union-find connectivity with virtual edge nodes, no edge-label trickery. If
the fast batched env and this slow one agree move-for-move on random games,
both the label-flooding algorithm and its batched-dilation implementation are
confirmed. (Analogue of the reference's OpenSpiel equivalence test,
boardlaw/hex/tests.py:155-184.)
"""
import numpy as np

NEIGHBOURS = ((-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0))


class GoldenHex:
    """Single game. Black (0) connects top-bottom, white (1) left-right.
    White moves/observes in the transposed frame."""

    def __init__(self, size):
        self.size = size
        self.reset()

    def reset(self):
        # 0 empty, 1 black, 2 white
        self.cells = np.zeros((self.size, self.size), int)
        self.seat = 0

    def valid(self):
        empty = self.cells == 0
        grid = empty.T if self.seat == 1 else empty
        return grid.reshape(-1)

    def _connected(self, color):
        """Does `color` connect its two edges? BFS over its stones."""
        S = self.size
        stones = self.cells == (1 if color == 0 else 2)
        if color == 0:
            starts = [(0, c) for c in range(S) if stones[0, c]]
            goal = lambda r, c: r == S - 1
        else:
            starts = [(r, 0) for r in range(S) if stones[r, 0]]
            goal = lambda r, c: c == S - 1
        seen = set(starts)
        stack = list(starts)
        while stack:
            r, c = stack.pop()
            if goal(r, c):
                return True
            for dr, dc in NEIGHBOURS:
                rr, cc = r + dr, c + dc
                if 0 <= rr < S and 0 <= cc < S and stones[rr, cc] and (rr, cc) not in seen:
                    seen.add((rr, cc))
                    stack.append((rr, cc))
        return False

    def step(self, action):
        """Returns (terminal, rewards[2]). Auto-resets on terminal."""
        S = self.size
        if self.seat == 0:
            r, c = action // S, action % S
        else:
            r, c = action % S, action // S
        assert self.cells[r, c] == 0, "invalid move"
        self.cells[r, c] = 1 if self.seat == 0 else 2

        won = self._connected(self.seat)
        rewards = np.zeros(2)
        if won:
            rewards[self.seat] = 1.0
            rewards[1 - self.seat] = -1.0
            self.reset()
            return True, rewards
        self.seat = 1 - self.seat
        return False, rewards

    def obs(self):
        """(S,S,2) planes in the current player's frame."""
        own_id = 1 if self.seat == 0 else 2
        cells = self.cells.T if self.seat == 1 else self.cells
        own = (cells == own_id).astype(float)
        opp = ((cells != 0) & (cells != own_id)).astype(float)
        return np.stack([own, opp], -1)
