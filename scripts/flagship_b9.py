"""The full-range 9x9 flagship run (r4 VERDICT next-steps #3 and #5 in one):

- 512x4 bf16 at 32k envs with log-spaced FLOP snapshots (storage.BOUNDS[9]
  spans 1e12..1e17 — the reference's full compute range, storage.py:12-19),
  desc='scaling-study' so the snapshots join the b9 frontier league;
- the EXTERNAL GTP-engine arena (gtphex randomization ladder + activelo
  posterior on CPU in a child process) logging `elo-arena` throughout —
  BASELINE config 4 run to strength, not just wiring proof.

Resumable: if a previous flagship run exists it continues from its latest
checkpoint (step-level resume + FLOP-counter seeding), so tunnel wedges are
recoverable by re-launching.

Usage: python scripts/flagship_b9.py [max_steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")

DESC = "scaling-study"
NET = (9, 512, 4)


def existing_run():
    from boardlaw_tpu.pavlov import runs

    for name, info in sorted(runs.pandas().iterrows()):
        if (info.get("description") == DESC
                and info.get("params.width") == NET[1]
                and info.get("params.boardsize") == NET[0]):
            return name
    return None


def main():
    max_steps = int(sys.argv[1]) if len(sys.argv) > 1 else None
    from boardlaw_tpu import train as T

    prev = existing_run()
    run = T.run(
        *NET,
        desc=DESC,
        n_envs=32 * 1024,
        storer="flops",
        max_steps=max_steps,
        resume=prev,
        arena=True,
        arena_ladder="external",
        dtype="bfloat16",
        tree_dtype="bfloat16",
    )
    print(f"[flagship] {'resumed' if prev else 'trained'} {run}", flush=True)


if __name__ == "__main__":
    main()
