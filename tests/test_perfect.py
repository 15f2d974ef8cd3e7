"""Exact perfect-play oracle tests (arena/perfect.py).

The 3x3 ground truth is cross-checked two ways: against an independent
pure-python minimax written directly from the Hex rules (no shared code with
the env), and against the published small-board result that the four
obtuse-side openings lose for the first player.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boardlaw_tpu.arena import perfect
from boardlaw_tpu.envs import hex

S = 3
NEI = {
    (r, c): [(r2, c2) for r2, c2 in
             [(r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1),
              (r - 1, c + 1), (r + 1, c - 1)]
             if 0 <= r2 < S and 0 <= c2 < S]
    for r in range(S) for c in range(S)
}


def _wins(cells, player):
    mine = {p for p, v in cells.items() if v == player}
    if player == 0:
        frontier = [p for p in mine if p[0] == 0]
        goal = lambda p: p[0] == S - 1
    else:
        frontier = [p for p in mine if p[1] == 0]
        goal = lambda p: p[1] == S - 1
    seen = set(frontier)
    while frontier:
        p = frontier.pop()
        if goal(p):
            return True
        for q in NEI[p]:
            if q in mine and q not in seen:
                seen.add(q)
                frontier.append(q)
    return False


_MEMO = {}


def _value(cells_t, player):
    key = (cells_t, player)
    if key in _MEMO:
        return _MEMO[key]
    cells = dict(cells_t)
    best = -1
    for r in range(S):
        for c in range(S):
            if (r, c) in cells:
                continue
            cells[(r, c)] = player
            v = 1 if _wins(cells, player) else -_value(
                tuple(sorted(cells.items())), 1 - player)
            del cells[(r, c)]
            best = max(best, v)
    _MEMO[key] = best
    return best


def test_first_move_values_match_independent_minimax():
    solver = perfect.Solver(3)
    env_vals = solver.action_values(np.zeros((3, 3), np.uint8), 0,
                                    alpha_beta=False).reshape(3, 3)
    for r in range(3):
        for c in range(3):
            v = 1 if _wins({(r, c): 0}, 0) else -_value((((r, c), 0),), 1)
            assert env_vals[r, c] == v, (r, c, env_vals)


def test_known_3x3_openings():
    # published small-board result: the four obtuse-side first moves lose,
    # the other five win (board frame: black connects top-bottom)
    solver = perfect.Solver(3)
    vals = solver.action_values(np.zeros((3, 3), np.uint8), 0,
                                alpha_beta=False).reshape(3, 3)
    expected = np.array([[-1, -1, 1], [1, 1, 1], [1, -1, -1]], np.float32)
    np.testing.assert_array_equal(vals, expected)


def test_exact_opening_wins():
    winners, world = perfect.exact_opening_wins(3, cache=False)
    assert world.n_envs == len(winners) == 72
    # black opened 4 losing moves x exactly 1 win-preserving white reply each
    counts = np.bincount(winners, minlength=2)
    assert counts[0] == 68 and counts[1] == 4, counts


def test_perfect_vs_perfect_black_always_wins():
    # the empty 3x3 board is a first-player win; perfect play must convert
    # every single game
    solver = perfect.Solver(3)
    a0, a1 = perfect.PerfectAgent(solver, seed=0), perfect.PerfectAgent(solver, seed=1)
    from boardlaw_tpu.arena.mohex_calibration import play_out

    world = hex.Hex.initial(8, 3)
    winners = play_out(world, [a0, a1], key=jax.random.PRNGKey(0))
    assert (winners == 0).all(), winners


def test_calibrate_exact_random_agent():
    # a random agent must lose EVERY game as white (perfect black never errs
    # from the winning empty board); as black it may stumble into wins
    from boardlaw_tpu.envs import validation

    inner = validation.RandomAgent()

    def random_agent(world, key, eval=False):
        d = inner(world)
        return {**d, "actions": jax.random.categorical(key, d["logits"], -1)}

    out = perfect.calibrate_exact(random_agent, boardsize=3, n_envs=32,
                                  key=jax.random.PRNGKey(5))
    # evaluate() plays both seat orders; the as-white half contributes zero
    assert out["games"] == 32
    assert out["winrate"] <= 0.5
    for r in out["results"]:
        idx = list(r["names"]).index("agent")
        if idx == 1:  # agent as white
            assert r["wins"][1] == 0, r
