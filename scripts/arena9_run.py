"""BASELINE config 4: a real 9x9 chip training run with the EXTERNAL
GTP-engine arena (gtphex randomization ladder + activelo posterior logged to
`elo-arena`), committing the ledger + stats as artifacts
(r2 VERDICT next-step #6; reference arena/live/__init__.py:170-209).

Usage: python scripts/arena9_run.py [steps]
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/arena9"


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from boardlaw_tpu import train as T
    from boardlaw_tpu.pavlov import runs, stats

    run = T.run(
        9, 512, 4,
        desc="arena9-external",
        n_envs=16384,
        storer="time",
        max_steps=steps,
        arena=True,
        arena_ladder="external",
        dtype="bfloat16",
        tree_dtype="bfloat16",
    )
    print(f"[arena9] trained {run}", flush=True)

    os.makedirs(OUT, exist_ok=True)
    rd = runs.run_dir(run)
    # ledger + arena elo stats + logs are the config-4 evidence
    for f in os.listdir(rd):
        if "ledger" in f or "elo-arena" in f or f.startswith("logs"):
            shutil.copy(os.path.join(rd, f), OUT)
    df = stats.dataframe(run, rule="60s")
    df.to_csv(f"{OUT}/stats.csv")
    arena_cols = [c for c in df.columns if "elo-arena" in c]
    summary = {
        "run": run,
        "steps": steps,
        "arena_channels": arena_cols,
        "final": {c: float(df[c].dropna().iloc[-1]) for c in arena_cols
                  if df[c].dropna().size},
        "n_arena_points": int(max((df[c].dropna().size for c in arena_cols),
                                  default=0)),
    }
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
