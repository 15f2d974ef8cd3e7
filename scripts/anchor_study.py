"""Anchor the Elo scale to TRUE perfect play at 3x3 (r4 VERDICT next-step #6).

The reference approximates a perfect-play anchor with MoHex labels/ladders
(arena/mohex.py:13-58, arena/live/__init__.py:79-128); here 3x3 is solved
EXACTLY (arena/perfect.py), so the anchor is the real thing: every snapshot
of a 3x3 training run gets (a) a league Elo from an all-pairs round robin
(the repo's usual relative scale) and (b) an absolute winrate against the
exact perfect-play oracle over both seat orders — tying the relative scale
to an absolute zero on one boardsize. Also commits the exact 2-ply opening
labels (the reference's mohex.py:41-58 table, with a true oracle).

Usage:
    python scripts/anchor_study.py train    # 3x3 run, 21 time-spaced snapshots
    python scripts/anchor_study.py measure  # league + perfect calibration
    python scripts/anchor_study.py all
"""
import argparse
import json
import logging
import os
import sys

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/anchor3"
DESC = "anchor3"
BOARD, WIDTH, DEPTH = 3, 2, 4  # BEST row for 3x3 (train.py BEST)


def existing_run():
    from boardlaw_tpu.pavlov import runs

    for name, info in sorted(runs.pandas().iterrows()):
        if info.get("description") == DESC:
            return name
    return None


def train(args):
    from boardlaw_tpu import train as T

    run = existing_run()
    if run:
        print(f"[anchor3] already trained: {run}", flush=True)
        return run
    # time storer: the 3x3 width-2 net is ~50 params, so the b3 FLOP
    # savepoints (1e10..5e11) sit ~1e8 samples out — the 60s log-spaced
    # time schedule gives 21 snapshots at this board's natural scale
    run = T.run(
        BOARD, WIDTH, DEPTH,
        desc=DESC,
        n_envs=args.envs,
        storer="time",
        max_steps=args.steps,
        arena=False,
    )
    print(f"[anchor3] trained {run}", flush=True)
    return run


def measure(args):
    import numpy as np
    import jax

    from boardlaw_tpu import elos
    from boardlaw_tpu.arena import common, perfect
    from boardlaw_tpu.envs import hex
    from boardlaw_tpu.pavlov import storage as pstorage

    run = existing_run()
    assert run, "train first"
    os.makedirs(OUT, exist_ok=True)

    snaps = pstorage.snapshots(run)
    idxs = sorted(snaps)
    # thin to at most 8 snapshots, log-spaced over the run
    if len(idxs) > 8:
        sel = np.unique(np.geomspace(1, len(idxs), 8).astype(int) - 1)
        idxs = [idxs[i] for i in sel]
    agents = {}
    for i in idxs:
        a = common.agent(run, i)
        if a is not None:
            agents[f"snap-{i}"] = a
    # a random-play baseline row gives the anchor its dynamic range (the
    # trained 3x3 snapshots converge almost immediately, so without it the
    # league spans only ~30 Elo and the absolute scale looks flat)
    from boardlaw_tpu.envs import validation

    _rand = validation.RandomAgent()
    agents["random"] = lambda world, key, eval=True: _rand(world, key)
    names = list(agents)
    print(f"[anchor3] {len(names)} snapshots: {names}", flush=True)

    # (a) league Elos: all-pairs round robin, MLE solve
    import pandas as pd

    wins = pd.DataFrame(0.0, index=names, columns=names)
    games = pd.DataFrame(0.0, index=names, columns=names)
    key = jax.random.PRNGKey(0)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            key, sub = jax.random.split(key)
            world = hex.Hex.initial(args.envs_per * 2, BOARD)
            results = common.evaluate(
                world, {names[i]: agents[names[i]], names[j]: agents[names[j]]},
                key=sub)
            for r in results:
                a, b = r["names"]
                wins.loc[a, b] += r["wins"][0]
                wins.loc[b, a] += r["wins"][1]
                games.loc[a, b] += r["games"]
                games.loc[b, a] += r["games"]
    league = elos.solve(wins, games)  # nats, best = 0
    league_elos = league * 400 / np.log(10)

    # (b) absolute anchor: winrate vs the EXACT oracle, both seat orders
    perfect_rates = {}
    for nm in names:
        key, sub = jax.random.split(key)
        out = perfect.calibrate_exact(agents[nm], boardsize=BOARD,
                                      n_envs=args.perfect_envs, key=sub)
        perfect_rates[nm] = {"winrate_vs_perfect": out["winrate"],
                             "games": out["games"]}
        print(f"[anchor3] {nm}: vs-perfect {out['winrate']:.3f}", flush=True)

    # (c) the exact opening table (reference mohex.py:41-58 analog)
    winners, world = perfect.exact_opening_wins(BOARD)
    openings = {
        "n_openings": int(len(winners)),
        "black_wins": int((winners == 0).sum()),
        "white_wins": int((winners == 1).sum()),
        "winners_by_seat": [int(w) for w in winners],
    }

    summary = {
        "run": run,
        "boardsize": BOARD,
        "net": f"{WIDTH}x{DEPTH}",
        "snapshots": {
            nm: {
                "league_elo": float(league_elos[nm]),
                **perfect_rates[nm],
            }
            for nm in names
        },
        "openings_exact": openings,
        "note": ("league_elo is relative (best snapshot = 0); "
                 "winrate_vs_perfect is absolute — perfect black converts "
                 "every game from the empty 3x3 board, so the as-white half "
                 "of an agent's games is winnable only via opponent error "
                 "(there is none) and the theoretical ceiling vs the oracle "
                 "is 0.5"),
    }
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["snapshots"]), flush=True)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xs = [summary["snapshots"][nm]["league_elo"] for nm in names]
        ys = [summary["snapshots"][nm]["winrate_vs_perfect"] for nm in names]
        fig, ax = plt.subplots(figsize=(5.5, 4))
        ax.plot(xs, ys, "o-", color="#2468a8")
        for nm, x, y in zip(names, xs, ys):
            ax.annotate(nm.split("-")[-1], (x, y), fontsize=7,
                        textcoords="offset points", xytext=(4, 4))
        ax.axhline(0.5, color="0.6", ls="--", lw=1,
                   label="ceiling vs oracle (0.5)")
        ax.set_xlabel("league Elo (relative, best = 0)")
        ax.set_ylabel("winrate vs exact perfect play")
        ax.set_title("3x3: relative Elo vs absolute anchor")
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(f"{OUT}/elo_vs_perfect.png", dpi=150)
    except Exception as e:
        print(f"[anchor3] plot skipped: {e}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("stage", choices=["train", "measure", "all"])
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--envs-per", type=int, default=64)
    p.add_argument("--perfect-envs", type=int, default=64)
    p.add_argument("--cpu", action="store_true",
                   help="pin jax to CPU (run beside a busy chip)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.stage in ("train", "all"):
        train(args)
    if args.stage in ("measure", "all"):
        measure(args)


if __name__ == "__main__":
    main()
