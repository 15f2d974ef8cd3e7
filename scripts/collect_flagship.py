"""Collect the flagship run's external-arena evidence into results/arena9
(r4 VERDICT next-step #5: a rising elo-arena curve, not just wiring proof).

Usage: python scripts/collect_flagship.py [run-substring]
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/arena9"


def main():
    from boardlaw_tpu.pavlov import runs, stats

    target = None
    for name, info in sorted(runs.pandas().iterrows()):
        if (info.get("description") == "scaling-study"
                and info.get("params.width") == 512
                and info.get("params.boardsize") == 9):
            target = name
    if len(sys.argv) > 1:
        target = runs.resolve(sys.argv[1])
    assert target, "no flagship run found"

    os.makedirs(OUT, exist_ok=True)
    rd = runs.run_dir(target)
    for f in os.listdir(rd):
        if "ledger" in f or "elo-arena" in f or "arena-games" in f:
            shutil.copy(os.path.join(rd, f), OUT)
    df = stats.dataframe(target, rule="60s")
    df.to_csv(f"{OUT}/stats.csv")
    arena_cols = [c for c in df.columns if "elo-arena" in c]
    mu_col = next((c for c in arena_cols if c.endswith("mu") or c.endswith("mean")),
                  arena_cols[0] if arena_cols else None)
    series = df[mu_col].dropna() if mu_col else None
    summary = {
        "run": target,
        "arena_channels": arena_cols,
        "n_arena_points": int(series.size) if series is not None else 0,
        "first_mu": float(series.iloc[0]) if series is not None and series.size else None,
        "final_mu": float(series.iloc[-1]) if series is not None and series.size else None,
        "max_mu": float(series.max()) if series is not None and series.size else None,
        # the posterior starts at a wide prior, dips while activelo learns
        # the fresh net is below the ladder, then climbs as training bites —
        # min_mu -> final_mu is the rise the r4 verdict asked to see
        "min_mu": float(series.min()) if series is not None and series.size else None,
    }
    if arena_cols:
        sig_col = next((c for c in arena_cols if c.endswith("sigma") or c.endswith("std")), None)
        if sig_col is not None and df[sig_col].dropna().size:
            summary["final_sigma"] = float(df[sig_col].dropna().iloc[-1])
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)

    # the rising-curve figure (r4 VERDICT #5's actual ask): elo-arena mu
    # +/- sigma over the run's wall clock
    if mu_col is not None and series is not None and series.size:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import numpy as np

            t = (series.index - series.index[0]).total_seconds() / 3600.0
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.plot(t, series.values, "o-", color="#2468a8", label="latest vs ladder")
            sig_col = next((c for c in arena_cols
                            if c.endswith("sigma") or c.endswith("std")), None)
            if sig_col is not None:
                sig = df[sig_col].reindex(series.index)
                ax.fill_between(t, series.values - sig.values,
                                series.values + sig.values,
                                alpha=0.2, color="#2468a8", label="±σ")
            ax.axhline(0, color="0.5", ls="--", lw=1)
            ax.set_xlabel("hours of training")
            ax.set_ylabel("elo-arena μ (nats vs best external ladder engine)")
            ax.set_title("9x9 flagship vs external GTP ladder")
            ax.legend(fontsize=8)
            ax.grid(alpha=0.3)
            fig.tight_layout()
            fig.savefig(f"{OUT}/elo_arena_curve.png", dpi=150)
        except Exception as e:
            print(f"[collect] plot skipped: {e}", flush=True)


if __name__ == "__main__":
    main()
