"""Training-time evaluation: a rolling arena scoring the latest checkpoint
against a reference ladder, with active matchmaking and a Bayesian Elo
posterior.

Reference counterpart: boardlaw/arena/live/__init__.py — a spawned process
reloads the latest checkpoint every ~15s, plays it against a MoHex
randomization ladder, solves the activelo posterior over the cumulative game
ledger, and logs `elo-mohex` mean/std stats (live/__init__.py:134-209).

The default ladder here is a *search-compute* ladder: fixed MCTS agents with
uniform-random evaluations and geometrically increasing node counts — a
stable external reference that needs no binary. When a MoHex executable is
available (`mohex.available()`), the ladder uses MoHex randomization levels
exactly like the reference.
"""
from __future__ import annotations

import multiprocessing as mp
import time
from logging import getLogger

import numpy as np
import pandas as pd

from .. import activelo
from ..envs import validation
from ..mcts import MCTSAgent
from ..pavlov import json_store, logs, runs, stats
from . import common

log = getLogger(__name__)

LEDGER = "arena-games"
LATEST = "latest"


def rollout_ladder(nodes=(1, 4, 16, 64)):
    """Reference opponents: pure-rollout MCTS at increasing search budgets."""
    ladder = {}
    for n in nodes:
        if n <= 1:
            ladder["rollout-1"] = _random_agent()
        else:
            ladder[f"rollout-{n}"] = MCTSAgent(
                validation.RandomAgent(), n_nodes=n, noise_eps=0.0
            )
    return ladder


def external_ladder(randoms=(1.0, 0.75, 0.5, 0.0), command=None, **kwargs):
    """The reference's external-engine randomization ladder (MoHex blended
    with uniform-random moves at decreasing rates, live/__init__.py:134-209).
    Uses the MoHex binary when available, otherwise the bundled gtphex engine
    (cpp/gtphex.cpp) — a real GTP subprocess either way."""
    from .. import gtp_engine, mohex

    if command is None and not mohex.available():
        command = gtp_engine.command()
    return {
        f"ext-{r:g}": mohex.MoHexAgent(random=r, command=command, **kwargs)
        for r in randoms
    }


def _random_agent():
    inner = validation.RandomAgent()

    def agent(world, key, eval=False):
        import jax

        d = inner(world)
        actions = jax.random.categorical(key, d["logits"], axis=-1)
        return {**d, "actions": actions}

    return agent


def record_result(run, black, white, black_wins, white_wins):
    def add(obj):
        key = f"{black}|{white}"
        rec = obj.setdefault(key, {"black_wins": 0.0, "white_wins": 0.0})
        rec["black_wins"] += black_wins
        rec["white_wins"] += white_wins

    json_store.update(run, LEDGER, add)


def ledger_trials(run):
    obj = json_store.read(run, LEDGER)
    rows = []
    for key, rec in obj.items():
        black, white = key.split("|")
        rows.append(
            {
                "black_agent": black,
                "white_agent": white,
                "black_wins": rec["black_wins"],
                "white_wins": rec["white_wins"],
            }
        )
    return pd.DataFrame(rows, columns=["black_agent", "white_agent", "black_wins", "white_wins"])


def symmetric_counts(trials, names):
    """(games, wins) matrices over `names` from a trials frame."""
    n = pd.DataFrame(0.0, index=names, columns=names)
    w = pd.DataFrame(0.0, index=names, columns=names)
    for _, row in trials.iterrows():
        b, wh = row.black_agent, row.white_agent
        if b not in names or wh not in names:
            continue
        g = row.black_wins + row.white_wins
        n.loc[b, wh] += g
        n.loc[wh, b] += g
        w.loc[b, wh] += row.black_wins
        w.loc[wh, b] += row.white_wins
    return n, w


class RollingArena:
    """Keeps a cumulative ledger of latest-vs-ladder games, solving the
    posterior and choosing the most informative challenger each round
    (reference live/__init__.py:134-168)."""

    def __init__(self, run, n_envs=32, ladder=None, search_kwargs=None):
        self.run = runs.resolve(run)
        self.n_envs = n_envs
        self.ladder = ladder or rollout_ladder()
        self.search_kwargs = search_kwargs or {}
        self.soln = None
        self.seed = 0

    def play(self, agent=None):
        agent = agent or common.agent(self.run, **self.search_kwargs)
        if agent is None:
            return None

        names = [LATEST] + list(self.ladder)
        trials = ledger_trials(self.run)
        n, w = symmetric_counts(trials, names)

        try:
            self.soln = activelo.solve(n, w, soln=self.soln)
        except Exception as e:
            log.warning(f"activelo failed: {e}")
            self.soln = None

        if self.soln is not None and n.loc[LATEST].sum() > 0:
            imp = activelo.improvement(self.soln)
            challenger = imp.loc[LATEST].drop(LATEST, errors="ignore").idxmax()
        else:
            challenger = list(self.ladder)[0]

        import jax

        self.seed += 1
        world = common.worlds(self.run, self.n_envs)
        results = common.evaluate(
            world,
            {LATEST: agent, challenger: self.ladder[challenger]},
            key=jax.random.PRNGKey(self.seed),
        )
        for r in results:
            black, white = r["names"]
            record_result(self.run, black, white, r["wins"][0], r["wins"][1])

        trials = ledger_trials(self.run)
        n, w = symmetric_counts(trials, names)
        try:
            self.soln = activelo.solve(n, w, soln=self.soln)
        except Exception as e:
            log.warning(f"activelo failed after games: {e}")
            return None

        mu = self.soln.mu
        best = mu.drop(LATEST).idxmax()
        rel = mu[LATEST] - mu[best]
        # covariance-aware std of the pairwise gap (reference
        # live/analysis.py:14-21) — the marginal std ignores correlations
        Sigma = self.soln.Sigma
        var = (
            Sigma.loc[LATEST, LATEST]
            - Sigma.loc[LATEST, best]
            - Sigma.loc[best, LATEST]
            + Sigma.loc[best, best]
        )
        sigma_d = float(np.sqrt(max(var, 0)))
        stats.mean_std("elo-arena", float(rel), sigma_d)
        log.info(f"arena: latest elo {rel:+.2f} ± {sigma_d:.2f} vs {best} (played {challenger})")
        return rel


def _loop(run, interval, ladder="rollout"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    arena = RollingArena(
        run, ladder=external_ladder() if ladder == "external" else None,
        # the child evaluates on CPU beside the training chip: the batched
        # grow-mode search keeps a 9x9 "latest"-agent move at CPU-tolerable
        # cost (the sequential K=1 walk is ~10x slower per move)
        search_kwargs={"leaves_per_pass": 8, "use_pallas": False,
                       "grow_passes": True},
    )
    # logs.to_run gives the child its own logs.{n}.txt in the run dir, so
    # arena lines are visible to `logs.from_run`/`follow` (reference
    # live/__init__.py:195 enters both contexts)
    with logs.to_run(run), stats.to_run(run):
        while True:
            try:
                arena.play()
            except Exception as e:  # keep evaluating through transient errors
                log.warning(f"arena loop error: {e}")
            time.sleep(interval)


def run(run_name, interval=15, ladder="rollout"):
    """Spawn the background arena process (reference live/__init__.py:193-209).
    The child pins itself to CPU so it never contends for the training chip.
    `ladder="external"` evaluates against the GTP-engine randomization ladder
    (MoHex when present, bundled gtphex otherwise) — the reference's
    config-4 external-opponent arena. Returns the Process; call .terminate()
    when training ends."""
    ctx = mp.get_context("spawn")
    p = ctx.Process(
        target=_loop, args=(runs.resolve(run_name), interval, ladder), daemon=True
    )
    p.start()
    return p
