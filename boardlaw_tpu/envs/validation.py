"""Synthetic validation games with *known* values, for search correctness tests.

Reference counterpart: boardlaw/validation.py. Each game plants exact
logits/values on the world itself so `ProxyAgent` can stand in for a network
and MCTS output can be compared against analytic values (reference
validation.py:1-9 states the strategy).

Games:
  Win              — one step, one seat, instant +1           (validation.py:82-111)
  WinnerLoser      — two seats, first wins +1 / second -1     (validation.py:113-143)
  All              — submit 1 every turn for `length` turns;
                     root value is 2^-length                  (validation.py:146-200)
  SequentialMatrix — one-shot 2x2 matrix games, incl.
                     prisoner's dilemma                       (validation.py:213-271)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import Masked, Tensor, Transition


def uniform_logits(valid):
    return jnp.log(valid.astype(jnp.float32) / valid.sum(-1, keepdims=True))


# --------------------------------------------------------------------------
# Agents (protocol doubles)
# --------------------------------------------------------------------------

class ProxyAgent:
    """Returns the logits/v planted on the world — lets MCTS run against
    exact known values (reference validation.py:16-21)."""

    def __call__(self, world, key=None):
        return {"logits": world.logits, "v": world.v}


class RandomAgent:
    """Uniform over valid actions, zero value (reference validation.py:23-30)."""

    def __call__(self, world, key=None):
        B = world.valid.shape[0]
        out = {
            "logits": uniform_logits(world.valid),
            "v": jnp.zeros((B, world.n_seats), jnp.float32),
        }
        if key is not None:
            out["actions"] = jax.random.categorical(key, out["logits"], axis=-1)
        return out


class MonteCarloAgent:
    """Rollout-based reference agent: estimates per-action values by uniform
    random playouts (reference validation.py:32-76). ``max_steps`` bounds the
    playout under jit."""

    def __init__(self, n_rollouts, temperature=1.0, max_steps=256):
        self.n_rollouts = n_rollouts
        self.temperature = temperature
        self.max_steps = max_steps

    def rollout(self, world, key):
        B = world.valid.shape[0]

        def cond(carry):
            _, _, live, _, t = carry
            return live.any() & (t < self.max_steps)

        def body(carry):
            world, key, live, reward, t = carry
            key, sub = jax.random.split(key)
            actions = jax.random.categorical(sub, uniform_logits(world.valid), axis=-1)
            first = actions if t == 0 else None
            world, tr = world.step(actions)
            reward = reward + tr.rewards * live[:, None]
            live = live & ~tr.terminal
            return world, key, live, reward, t + 1

        key, sub = jax.random.split(key)
        first_actions = jax.random.categorical(sub, uniform_logits(world.valid), axis=-1)
        world, tr = world.step(first_actions)
        reward = tr.rewards
        live = ~tr.terminal
        carry = (world, key, live, reward, jnp.array(1))
        _, _, _, reward, _ = jax.lax.while_loop(cond, body, carry)
        return reward, first_actions

    def __call__(self, world, key):
        B = world.valid.shape[0]
        A = world.valid.shape[1]
        envs = jnp.arange(B)

        totals = jnp.zeros((B, A, world.n_seats))
        counts = jnp.zeros((B, A, world.n_seats))
        for _ in range(self.n_rollouts):
            key, sub = jax.random.split(key)
            r, a = self.rollout(world, sub)
            totals = totals.at[envs, a].add(r)
            counts = counts.at[envs, a].add(1.0)
        means = jnp.where(counts > 0, totals / jnp.maximum(counts, 1), 0.0)

        seat_means = means[envs, :, world.seats.astype(jnp.int32)]
        logits = jax.nn.log_softmax(self.temperature * seat_means, axis=-1)
        logits = jnp.where(world.valid, logits, -jnp.inf)

        key, sub = jax.random.split(key)
        return {
            "logits": logits,
            "actions": jax.random.categorical(sub, logits, axis=-1),
            "v": totals.sum(-2) / jnp.maximum(counts.sum(-2), 1),
        }


# --------------------------------------------------------------------------
# Games
# --------------------------------------------------------------------------

class Win(struct.PyTreeNode):
    """One-step one-seat win (+1)."""

    envs: jnp.ndarray

    @classmethod
    def initial(cls, n_envs=1):
        return cls(envs=jnp.arange(n_envs))

    @property
    def n_envs(self):
        return self.envs.shape[0]

    @property
    def n_seats(self):
        return 1

    @property
    def obs_space(self):
        return Tensor((1,))

    @property
    def action_space(self):
        return Masked(1)

    @property
    def valid(self):
        return jnp.ones((self.n_envs, 1), bool)

    @property
    def seats(self):
        return jnp.zeros((self.n_envs,), jnp.int32)

    @property
    def obs(self):
        return jnp.zeros((self.n_envs, 1), jnp.float32)

    @property
    def logits(self):
        return uniform_logits(self.valid)

    @property
    def v(self):
        return jnp.ones((self.n_envs, 1), jnp.float32)

    def step(self, actions):
        return self, Transition(
            terminal=jnp.ones((self.n_envs,), bool),
            rewards=jnp.ones((self.n_envs, 1), jnp.float32),
        )


class WinnerLoser(struct.PyTreeNode):
    """First seat wins each round (+1); second loses (-1)."""

    seats: jnp.ndarray

    @classmethod
    def initial(cls, n_envs=1):
        return cls(seats=jnp.zeros((n_envs,), jnp.int32))

    @property
    def n_envs(self):
        return self.seats.shape[0]

    @property
    def n_seats(self):
        return 2

    @property
    def obs_space(self):
        return Tensor((1,))

    @property
    def action_space(self):
        return Masked(1)

    @property
    def valid(self):
        return jnp.ones((self.n_envs, 1), bool)

    @property
    def obs(self):
        return jnp.zeros((self.n_envs, 1), jnp.float32)

    @property
    def logits(self):
        return uniform_logits(self.valid)

    @property
    def v(self):
        # +1 for seat 0, -1 for seat 1, regardless of whose turn it is
        ones = jnp.ones_like(self.seats, jnp.float32)
        return jnp.stack([ones, -ones], -1)

    def step(self, actions):
        terminal = self.seats == 1
        rewards = jnp.stack([terminal.astype(jnp.float32), -terminal.astype(jnp.float32)], -1)
        return (
            self.replace(seats=1 - self.seats),
            Transition(terminal=terminal, rewards=rewards),
        )


class All(struct.PyTreeNode):
    """Each seat must submit action 1 every turn for `length` turns; all-ones
    histories score +1 per seat, anything else 0. The exact root value is
    2^-length for each seat."""

    history: jnp.ndarray  # (B, length, n_seats) int32 in {-1, 0, 1}
    count: jnp.ndarray  # (B,) int32 plies played this episode

    @classmethod
    def initial(cls, n_envs=1, n_seats=1, length=4):
        return cls(
            history=jnp.full((n_envs, length, n_seats), -1, jnp.int32),
            count=jnp.zeros((n_envs,), jnp.int32),
        )

    @property
    def n_envs(self):
        return self.history.shape[0]

    @property
    def length(self):
        return self.history.shape[1]

    @property
    def n_seats(self):
        return self.history.shape[2]

    @property
    def max_count(self):
        return self.length * self.n_seats

    @property
    def obs_space(self):
        return Tensor((1,))

    @property
    def action_space(self):
        return Masked(2)

    @property
    def valid(self):
        return jnp.ones((self.n_envs, 2), bool)

    @property
    def seats(self):
        return (self.count % self.n_seats).astype(jnp.int32)

    @property
    def obs(self):
        return (self.count[:, None] / self.max_count).astype(jnp.float32)

    @property
    def logits(self):
        return uniform_logits(self.valid)

    @property
    def v(self):
        ones = (self.history == 1).sum(-2)  # (B, n_seats)
        correct_so_far = ones == self.count[:, None]
        correct_to_go = 2.0 ** (ones - self.length).astype(jnp.float32)
        return correct_so_far * correct_to_go

    def step(self, actions):
        envs = jnp.arange(self.n_envs)
        idx = self.count // self.n_seats
        history = self.history.at[envs, idx, self.seats].set(actions.astype(jnp.int32))
        count = self.count + 1

        terminal = count == self.max_count
        rewards = (terminal[:, None] & (history == 1).all(-2)).astype(jnp.float32)

        count = jnp.where(terminal, 0, count)
        history = jnp.where(terminal[:, None, None], -1, history)
        return (
            self.replace(history=history, count=count),
            Transition(terminal=terminal, rewards=rewards),
        )


class SequentialMatrix(struct.PyTreeNode):
    """Two-seat one-shot 2x2 matrix game played sequentially: seat 0 moves,
    then seat 1, then payoffs from the (a0, a1) cell."""

    payoffs: jnp.ndarray  # (B, 2, 2, 2)
    moves: jnp.ndarray  # (B, 2) int32, -1 until played
    seats: jnp.ndarray  # (B,) int32

    @classmethod
    def initial(cls, payoff, n_envs=1):
        payoff = jnp.asarray(payoff, jnp.float32)
        return cls(
            payoffs=jnp.broadcast_to(payoff[None], (n_envs,) + payoff.shape),
            moves=jnp.full((n_envs, 2), -1, jnp.int32),
            seats=jnp.zeros((n_envs,), jnp.int32),
        )

    @classmethod
    def dilemma(cls, n_envs=1):
        return cls.initial(
            [[[0.0, 0.0], [1.0, 0.0]], [[0.0, 1.0], [0.5, 0.5]]], n_envs
        )

    @classmethod
    def antisymmetric(cls, n_envs=1):
        return cls.initial(
            [[[1.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [0.0, 0.1]]], n_envs
        )

    @property
    def n_envs(self):
        return self.seats.shape[0]

    @property
    def n_seats(self):
        return 2

    @property
    def obs_space(self):
        return Tensor((1,))

    @property
    def action_space(self):
        return Masked(2)

    @property
    def obs(self):
        return self.moves[:, [0]].astype(jnp.float32)

    @property
    def valid(self):
        return jnp.ones((self.n_envs, 2), bool)

    @property
    def logits(self):
        return uniform_logits(self.valid)

    @property
    def v(self):
        return jnp.zeros((self.n_envs, 2), jnp.float32)

    def step(self, actions):
        envs = jnp.arange(self.n_envs)
        seats = self.seats + 1
        terminal = seats == 2

        moves = self.moves.at[envs, self.seats].set(actions.astype(jnp.int32))
        picked = self.payoffs[envs, jnp.clip(moves[:, 0], 0), jnp.clip(moves[:, 1], 0)]
        rewards = jnp.where(terminal[:, None], picked, 0.0)

        seats = jnp.where(terminal, 0, seats)
        moves = jnp.where(terminal[:, None], -1, moves)
        return (
            self.replace(moves=moves, seats=seats),
            Transition(terminal=terminal, rewards=rewards),
        )
