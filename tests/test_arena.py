"""Arena tests: seat-balance with random agents (reference
arena/common.py:108-115), mock-agent league accounting (reference
arena/neural.py:341-415), and the rolling-arena ledger."""
import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from boardlaw_tpu.arena import common, live, neural
from boardlaw_tpu.envs import hex, validation
from boardlaw_tpu.pavlov import runs, stats
from boardlaw_tpu.pavlov.tests import mock_dir
from boardlaw_tpu import train


def _random_agent():
    inner = validation.RandomAgent()

    def agent(world, key, eval=False):
        d = inner(world)
        return {**d, "actions": jax.random.categorical(key, d["logits"], axis=-1)}

    return agent


def test_evaluate_winnerloser():
    # seat 0 always wins: each pattern's seat-0 agent takes every game
    world = validation.WinnerLoser.initial(4)
    results = common.evaluate(world, {"one": _random_agent(), "two": _random_agent()})
    assert results[0]["names"] == ("one", "two")
    assert results[0]["wins"] == (2.0, 0.0)
    assert results[1]["names"] == ("two", "one")
    assert results[1]["wins"] == (2.0, 0.0)


def test_evaluate_hex_random():
    world = hex.Hex.initial(8, 3)
    results = common.evaluate(
        world, {"a": _random_agent(), "b": _random_agent()}, key=jax.random.PRNGKey(1)
    )
    total = sum(r["games"] for r in results)
    assert total == 8  # every game finished
    for r in results:
        assert sum(r["wins"]) == r["games"]


def _counting_agent(calls):
    inner = _random_agent()

    def agent(world, key, eval=False):
        calls.append(world.n_envs)
        return inner(world, key, eval=eval)

    return agent


def test_evaluate_compact_buckets_even():
    # alternating world, even buckets: every search is a compact half-batch
    calls = []
    world = validation.WinnerLoser.initial(4)
    common.evaluate(world, {"one": _counting_agent(calls), "two": _counting_agent(calls)})
    assert calls and all(c == 2 for c in calls)


def test_evaluate_compact_buckets_uneven():
    # mixed seats -> uneven ownership; the unified path must still gather a
    # compact (pow2-padded) sub-batch per agent, never the full batch
    # (r2 VERDICT weak #8: the old fallback searched full-batch per agent)
    B = 8
    world = hex.Hex.initial(B, 3)
    # advance envs 0..4 one ply so 5 envs sit at seat 1, 3 at seat 0
    acts = jnp.where(jnp.arange(B) < 5, 0, 0)
    stepped, _ = world.step(acts)
    import boardlaw_tpu.utils as utils

    world = utils.where(jnp.arange(B) < 5, stepped, world)
    assert set(np.asarray(world.seats).tolist()) == {0, 1}

    calls = []
    results = common.evaluate(
        world,
        {"a": _counting_agent(calls), "b": _counting_agent(calls)},
        key=jax.random.PRNGKey(0),
    )
    assert sum(r["games"] for r in results) == B  # every game finished
    # compact gathering: per-call sizes are pow2 pads of the owner buckets,
    # and the smaller bucket really ran compact (< full batch) — under the
    # old fallback every call would have been exactly B
    assert all(c & (c - 1) == 0 for c in calls)  # powers of two
    assert min(calls) < B


def test_external_ladder_builds_gtp_agents():
    # with MoHex absent the ladder must fall back to the bundled gtphex
    # engine and expose the reference's randomization rungs
    from boardlaw_tpu import gtp_engine, mohex

    ladder = live.external_ladder()
    assert set(ladder) == {"ext-1", "ext-0.75", "ext-0.5", "ext-0"}
    if not mohex.available():
        assert all(a._command == gtp_engine.command() for a in ladder.values())


def test_league_accounting():
    # 3 agents, every ordered pair plays exactly n_envs_per games
    agents = {name: _random_agent() for name in ["a", "b", "c"]}
    trials = neural.evaluate(boardsize=3, agents=agents, n_envs_per=2, n_envs=6)
    pairs = {(r.black_agent, r.white_agent) for r in trials.itertuples()}
    assert pairs == set(neural.all_matchups(["a", "b", "c"]))
    games = trials.black_wins + trials.white_wins
    assert (games == 2).all()


def test_chunk_jobs_cover_all_pairs():
    specs = {f"a{i}": i for i in range(5)}
    jobs = neural.chunk_jobs(specs, chunk_size=2)
    covered = [m for _, ms in jobs for m in ms]
    assert sorted(covered) == sorted(neural.all_matchups(list(specs)))
    # every job touches at most 2*chunk_size agents
    assert all(len(cs) <= 4 for cs, _ in jobs)


def _loader_random(spec):
    return _random_agent()


def test_league_farm_out():
    # 4 agents in chunks of 2, farmed over a 2-process pool: every ordered
    # pair plays exactly n_envs_per games (the reference's mock-league test,
    # neural.py:341-415, against the parallel path)
    specs = {name: None for name in ["a", "b", "c", "d"]}
    trials = neural.evaluate_parallel(
        boardsize=3, specs=specs, loader=_loader_random,
        n_envs_per=2, chunk_size=2, kind="device", max_workers=2,
    )
    pairs = {(r.black_agent, r.white_agent) for r in trials.itertuples()}
    assert pairs == set(neural.all_matchups(["a", "b", "c", "d"]))
    games = trials.black_wins + trials.white_wins
    assert (games == 2).all()


def test_agent_roundtrip():
    # save a run via train, reload it as an arena agent, play it
    with mock_dir():
        run = train.run(
            boardsize=3, width=4, depth=1, n_envs=8, nodes=4,
            mix_steps=8, buffer_len=4, max_steps=1, storer="time",
        )
        ag = common.agent(run)
        assert ag is not None
        world = common.worlds(run, 4)
        decisions = ag(world, jax.random.PRNGKey(0), eval=True)
        assert decisions["actions"].shape == (4,)

        results = common.evaluate(world, {"net": ag, "rand": _random_agent()})
        assert sum(r["games"] for r in results) == 4


def test_rolling_arena():
    with mock_dir():
        run = train.run(
            boardsize=3, width=4, depth=1, n_envs=8, nodes=4,
            mix_steps=8, buffer_len=4, max_steps=1, storer="time",
        )
        arena = live.RollingArena(run, n_envs=4, ladder={"rollout-1": _random_agent()})
        with stats.to_run(run):
            rel = arena.play()
        assert rel is not None
        trials = live.ledger_trials(run)
        assert trials.black_wins.sum() + trials.white_wins.sum() == 4
        # the stat channel was written
        assert "elo-arena" in stats.channels(run)
