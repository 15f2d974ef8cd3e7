"""Desaturation top-up for the b9 league (round-5 endgame, follow-on to
league_r5_fast): 60% of round-robin pairs came out one-sided 4-0, where the
MLE Elo gap is regularization-bounded — replaying those adds nothing. This
pass replays only the INFORMATIVE pairs (any split outcome), doubling the
games behind every adjacent-strength gap in the Elo chain, which is what the
frontier fit's scale actually rests on.

Usage: python scripts/league_r5_desat.py <deadline_unix_ts> [envs_per]
"""
import collections
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

    t = sql.trial_query(9, "scaling-study")
    agg = collections.defaultdict(lambda: [0.0, 0.0])
    for r in t.itertuples():
        a, b = sorted((r.black_agent, r.white_agent))
        w = ((r.black_wins, r.white_wins) if a == r.black_agent
             else (r.white_wins, r.black_wins))
        agg[(a, b)][0] += w[0]
        agg[(a, b)][1] += w[1]
    informative = [p for p, v in agg.items() if v[0] > 0 and v[1] > 0]
    names = sorted({a for p in informative for a in p})
    print(f"[desat] {len(informative)}/{len(agg)} informative pairs over "
          f"{len(names)} agents", flush=True)
    if not informative:
        return

    ags = sql.agent_query()
    kwargs = {"leaves_per_pass": 8, "use_pallas": False, "grow_passes": True}
    agents = {}
    for aid in names:
        row = ags.loc[aid]
        a = common.agent(row.run, int(row.idx), **kwargs)
        if a is not None:
            agents[int(aid)] = a

    matchups = [m for p in informative for m in (p, (p[1], p[0]))
                if m[0] in agents and m[1] in agents]
    rng = np.random.default_rng(1)
    rng.shuffle(matchups)
    n_envs = min(len(matchups) * envs_per, 1024)
    n_envs = max(n_envs - n_envs % 2, 2)
    print(f"[desat] {len(matchups)} matchups, {n_envs} envs, "
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
            print(f"[desat] {done:.0f} games done, "
                  f"{ev.moves / (time.time() - ev.start):.0f} moves/s "
                  f"({deadline - time.time():.0f}s left)", flush=True)

    rows = [(int(b), int(w), int(bw), int(ww), 0, 0.0)
            for (b, w), (bw, ww) in records.items()]
    sql.save_trials(rows)
    total = sum(bw + ww for _, _, bw, ww, _, _ in rows)
    print(f"[desat] saved {len(rows)} rows ({total:.0f} games, "
          f"finished={bool(ev.tracker.finished)})", flush=True)


if __name__ == "__main__":
    main()
