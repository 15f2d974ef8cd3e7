"""Deadline-aware thinned b9 league eval (round-5 endgame).

The full scaling-study league (32 agents x 4 envs-per ~ 160k league moves)
does not fit the session's remaining chip budget, and `scaling_study.py
evaluate` only persists trials when the whole league completes. This variant:

- thins the flagship run's snapshots (they are dense: 19 FLOP savepoints)
  while keeping every 128x2 seed-pair snapshot (the seed-gap study needs
  both seeds' full curves);
- runs the same ChunkEvaluator but with a wall-clock deadline, saving
  whatever trials have accumulated when it expires (the MLE Elo solve is
  happy with partial games; matchup order is randomized so partial coverage
  stays connected across the league rather than completing an ordered
  prefix).

Usage: python scripts/league_r5_fast.py <deadline_unix_ts> [envs_per]
"""
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 1500
    envs_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from boardlaw_tpu import sql
    from boardlaw_tpu.arena import common, neural

    sql.refresh()
    ags = sql.agent_query()
    ags = ags[(ags.boardsize == 9) & (ags.description == "scaling-study")]

    keep = []
    for run, g in ags.groupby("run"):
        g = g.sort_values("idx")
        if len(g) > 10:  # thin dense flagship curves, log-spaced, keep ends
            sel = np.unique(np.geomspace(1, len(g), 10).astype(int) - 1)
            g = g.iloc[sel]
        keep.append(g)
    import pandas as pd

    ags = pd.concat(keep)
    print(f"[league] {len(ags)} agents after thinning "
          f"({ags.groupby('run').size().to_dict()})", flush=True)

    kwargs = {"leaves_per_pass": 8, "use_pallas": False, "grow_passes": True}
    agents = {}
    for aid, row in ags.iterrows():
        a = common.agent(row.run, int(row.idx), **kwargs)
        if a is not None:
            agents[int(aid)] = a

    played = sql.trial_query(9, "scaling-study")
    seen = set(zip(played.black_agent, played.white_agent)) if len(played) else set()
    matchups = [m for m in neural.all_matchups(list(agents)) if m not in seen]
    rng = np.random.default_rng(0)
    rng.shuffle(matchups)
    if not matchups:
        print("[league] all matchups already played", flush=True)
        return
    n_envs = min(len(matchups) * envs_per, 1024)
    n_envs = max(n_envs - n_envs % 2, 2)
    print(f"[league] {len(matchups)} matchups, {n_envs} envs, "
          f"deadline in {deadline - time.time():.0f}s", flush=True)

    ev = neural.ChunkEvaluator(9, n_envs, agents, matchups, envs_per)
    records = {}
    last = time.time()
    while not ev.tracker.finished and time.time() < deadline:
        for (black, white), bw, ww in ev.step():
            rec = records.setdefault((black, white), [0.0, 0.0])
            rec[0] += bw
            rec[1] += ww
        if time.time() - last > 30:
            last = time.time()
            done = sum(v for vs in records.values() for v in vs)
            print(f"[league] {done:.0f} games done, "
                  f"{ev.moves / (time.time() - ev.start):.0f} moves/s "
                  f"({deadline - time.time():.0f}s left)", flush=True)

    rows = [
        (int(b), int(w), int(bw), int(ww), 0, 0.0)
        for (b, w), (bw, ww) in records.items()
    ]
    sql.save_trials(rows)
    total = sum(bw + ww for _, _, bw, ww, _, _ in rows)
    print(f"[league] saved {len(rows)} trial rows ({total:.0f} games, "
          f"finished={bool(ev.tracker.finished)})", flush=True)


if __name__ == "__main__":
    main()
