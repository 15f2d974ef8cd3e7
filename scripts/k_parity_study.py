"""K=8 vs K=1 learning-equivalence study (r2 VERDICT next-step #2a).

The batched multi-leaf search (K leaves per solve+eval pass,
mcts/search.py::simulate_multi) deliberately diverges from K sequential
reference sims. This study trains two otherwise-identical 7x7 128x4 agents to
the SAME sample budget — one with the reference-exact K=1 search, one with
the production K=8 search — then compares loss curves and plays them
head-to-head, so the sims/s headline can carry a measured (not assumed)
sample-efficiency statement.

Usage:
    python scripts/k_parity_study.py train   [--envs 8192] [--steps 1500]
    python scripts/k_parity_study.py compare [--h2h-envs 512]
    python scripts/k_parity_study.py all
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOARD, WIDTH, DEPTH = 7, 128, 4
OUTDIR = "results/k_parity"


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

    for k in (1, 8):
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
        )
        print(f"[k-parity] K={k} -> {run} ({time.time()-t0:.0f}s, "
              f"{args.steps} steps x {args.envs} envs)", flush=True)


def compare(args):
    import jax
    import numpy as np

    from boardlaw_tpu.arena import common
    from boardlaw_tpu.envs import hex
    from boardlaw_tpu.pavlov import stats

    os.makedirs(OUTDIR, exist_ok=True)
    runs_ = {k: existing_run(k) for k in (1, 8)}
    assert all(runs_.values()), f"train first (have {runs_})"

    # loss curves: mean policy/value loss over the run, resampled
    curves = {}
    for k, run in runs_.items():
        df = stats.dataframe(run, rule="60s",
                             channels_=["loss.policy", "loss.value"])
        curves[k] = {c: df[c].dropna().tolist() for c in df.columns}

    # head-to-head: latest snapshot of each, every seat permutation
    agents = {f"K{k}": common.agent(run) for k, run in runs_.items()}
    world = hex.Hex.initial(args.h2h_envs, BOARD)
    results = common.evaluate(world, agents, key=jax.random.PRNGKey(7))

    wins = {"K1": 0.0, "K8": 0.0}
    games = 0.0
    for r in results:
        for name, w in zip(r["names"], r["wins"]):
            wins[name] += w
        games += r["games"]
    k8_rate = wins["K8"] / max(games, 1)
    # binomial 2-sigma band around 0.5 for this many games
    band = 2 * 0.5 / np.sqrt(max(games, 1))

    summary = {
        "runs": runs_,
        "head_to_head": results,
        "k8_winrate": round(k8_rate, 4),
        "n_games": games,
        "two_sigma_band": round(band, 4),
        "within_noise": bool(abs(k8_rate - 0.5) <= band),
        "final_loss": {
            f"K{k}": {c: (curves[k][c][-1] if curves[k][c] else None)
                      for c in curves[k]}
            for k in curves
        },
    }
    with open(f"{OUTDIR}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "head_to_head"}),
          flush=True)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for ax, c in zip(axes, ["loss.policy", "loss.value"]):
            for k in (1, 8):
                ax.plot(curves[k][c], label=f"K={k}")
            ax.set_title(c)
            ax.set_xlabel("minutes")
            ax.legend()
        fig.tight_layout()
        fig.savefig(f"{OUTDIR}/loss_curves.png", dpi=120)
    except Exception as e:
        print(f"[k-parity] plot skipped: {e}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("stage", choices=["train", "compare", "all"])
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--h2h-envs", type=int, default=512)
    args = p.parse_args()
    if args.stage in ("train", "all"):
        train(args)
    if args.stage in ("compare", "all"):
        compare(args)


if __name__ == "__main__":
    main()
