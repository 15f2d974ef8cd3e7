"""K-vs-K learning-equivalence studies (r2 VERDICT #2a; r4 VERDICT #1).

The batched multi-leaf search (K leaves per solve+eval pass,
mcts/search.py::simulate_multi) deliberately diverges from K sequential
reference sims. This study trains otherwise-identical 7x7 128x4 agents to
the SAME sample budget at different K, then compares loss curves and plays
them head-to-head, so the sims/s headline can carry a measured (not assumed)
sample-efficiency statement.

Round-4 verdict on the original K=1-vs-K=8 design: 512 games is underpowered
(a 1.86-sigma deficit was billed as parity). The comparison default is now
>= 2048 games (two-sided 2-sigma band +-2.2%).

Usage:
    python scripts/k_parity_study.py train   [--ks 8,16] [--envs 8192] [--steps 1500]
    python scripts/k_parity_study.py compare [--ks 8,16] [--h2h-envs 2048]
    python scripts/k_parity_study.py all     [--ks 8,16]

(The committed K=1-vs-K=8 study in results/k_parity used --ks 1,8 with the
old 512-game default; results/k_parity_k16 holds the K=8-vs-K=16 study.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOARD, WIDTH, DEPTH = 7, 128, 4


def outdir(ks):
    return "results/k_parity" if ks == (1, 8) else f"results/k_parity_k{ks[1]}"


def desc(k):
    return f"k-parity-K{k}"


def existing_run(k):
    from boardlaw_tpu.pavlov import runs

    for name, info in sorted(runs.pandas().iterrows()):
        if info.get("description") == desc(k):
            return name
    return None


def train(args):
    from boardlaw_tpu import train as T

    for k in args.ks:
        if existing_run(k):
            print(f"[k-parity] K={k} already trained: {existing_run(k)}", flush=True)
            continue
        t0 = time.time()
        run = T.run(
            BOARD, WIDTH, DEPTH,
            desc=desc(k),
            n_envs=args.envs,
            storer="flops",
            max_steps=args.steps,
            arena=False,
            dtype="bfloat16",
            tree_dtype="bfloat16",
            leaves_per_pass=k,
            use_pallas=False if k > 1 else None,
            grow_passes=k > 1,
        )
        print(f"[k-parity] K={k} -> {run} ({time.time()-t0:.0f}s, "
              f"{args.steps} steps x {args.envs} envs)", flush=True)


def compare(args):
    import jax
    import numpy as np

    from boardlaw_tpu.arena import common
    from boardlaw_tpu.envs import hex
    from boardlaw_tpu.pavlov import stats

    out = outdir(args.ks)
    os.makedirs(out, exist_ok=True)
    runs_ = {k: existing_run(k) for k in args.ks}
    assert all(runs_.values()), f"train first (have {runs_})"
    ka, kb = args.ks  # kb is the challenger whose parity is under test

    # loss curves: mean policy/value loss over the run, resampled
    curves = {}
    for k, run in runs_.items():
        df = stats.dataframe(run, rule="60s",
                             channels_=["loss.policy", "loss.value"])
        curves[k] = {c: df[c].dropna().tolist() for c in df.columns}

    # head-to-head: latest snapshot of each, every seat permutation. Chunked
    # so h2h-envs can exceed what one batch of 64-node searches fits.
    agents = {f"K{k}": common.agent(run) for k, run in runs_.items()}
    wins = {f"K{ka}": 0.0, f"K{kb}": 0.0}
    games = 0.0
    done = 0
    chunk = min(args.h2h_envs, args.h2h_chunk)
    seed = 11
    while done < args.h2h_envs:
        n = min(chunk, args.h2h_envs - done)
        world = hex.Hex.initial(n, BOARD)
        results = common.evaluate(world, agents,
                                  key=jax.random.PRNGKey(seed + done))
        for r in results:
            for name, w in zip(r["names"], r["wins"]):
                wins[name] += w
            games += r["games"]
        done += n
        print(f"[k-parity] h2h {done}/{args.h2h_envs} games={games:.0f}",
              flush=True)
    kb_rate = wins[f"K{kb}"] / max(games, 1)
    # binomial 2-sigma band around 0.5 for this many games
    band = 2 * 0.5 / np.sqrt(max(games, 1))
    sigmas = (kb_rate - 0.5) / (0.5 / np.sqrt(max(games, 1)))

    summary = {
        "ks": list(args.ks),
        "runs": {str(k): v for k, v in runs_.items()},
        f"k{kb}_winrate": round(kb_rate, 4),
        "n_games": games,
        "two_sigma_band": round(band, 4),
        "deficit_sigmas": round(-sigmas, 2),
        "within_noise": bool(abs(kb_rate - 0.5) <= band),
        "final_loss": {
            f"K{k}": {c: (curves[k][c][-1] if curves[k][c] else None)
                      for c in curves[k]}
            for k in curves
        },
    }
    with open(f"{out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items()}), flush=True)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for ax, c in zip(axes, ["loss.policy", "loss.value"]):
            for k in args.ks:
                ax.plot(curves[k][c], label=f"K={k}")
            ax.set_title(c)
            ax.set_xlabel("minutes")
            ax.legend()
        fig.tight_layout()
        fig.savefig(f"{out}/loss_curves.png", dpi=120)
    except Exception as e:
        print(f"[k-parity] plot skipped: {e}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("stage", choices=["train", "compare", "all"])
    p.add_argument("--ks", default="8,16",
                   help="comma pair: baseline,challenger (e.g. 1,8 or 8,16)")
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--h2h-envs", type=int, default=2048)
    p.add_argument("--h2h-chunk", type=int, default=1024)
    args = p.parse_args()
    args.ks = tuple(int(x) for x in args.ks.split(","))
    assert len(args.ks) == 2
    if args.stage in ("train", "all"):
        train(args)
    if args.stage in ("compare", "all"):
        compare(args)


if __name__ == "__main__":
    main()
