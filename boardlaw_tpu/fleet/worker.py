"""Job-side entrypoint: parse FLEET_PARAMS and run training.

Reference counterpart: `run_jittens` (boardlaw/main.py:202-209), which reads
JITTENS_PARAMS/JITTENS_GPU from the environment.
"""
from __future__ import annotations

import json
import os


def main():
    params = json.loads(os.environ.get("FLEET_PARAMS", "{}"))
    print(f"fleet worker: {params}")

    from boardlaw_tpu import train

    train.run(**params)


if __name__ == "__main__":
    main()
