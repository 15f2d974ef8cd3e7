"""Virtual-device weak-scaling study: the sharded train_step at FIXED
per-device env count over 1/2/4/8 virtual CPU devices.

This is the software proxy for the 8-chip efficiency number (no multi-chip
hardware in this environment): it measures the GSPMD partitioning + collective
overhead the dp mesh introduces, not ICI bandwidth. Ideal weak scaling keeps
step time constant; efficiency = t(1)/t(n). Results land in STATUS.md's
multi-chip table.

Each device count needs its own process (XLA fixes the device count at
startup), so the parent spawns one child per n.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

n = %(n)d
per_dev_envs = %(envs)d

from boardlaw_tpu import train as T
from boardlaw_tpu.parallel import mesh as pmesh

cfg = T.TrainConfig(boardsize=5, width=32, depth=1, n_envs=n * per_dev_envs,
                    n_nodes=8, buffer_len=8, mix_steps=4, dtype='float32',
                    use_pallas=False)
mesh = pmesh.make_mesh()
assert mesh.shape['dp'] == n, (mesh.shape, n)
model, opt, init, warmup, train_step = T.make_train(cfg, mesh=mesh)
state = init(jax.random.PRNGKey(0))
state = pmesh.shard_train_state(state, mesh)
state = warmup(state, chunk=8)
state, aux = train_step(state)  # compile
jax.block_until_ready(aux['loss.total'])
times = []
for _ in range(20):
    t0 = time.perf_counter()
    state, aux = train_step(state)
    jax.block_until_ready(aux['loss.total'])
    times.append(time.perf_counter() - t0)
times.sort()
print(json.dumps({"n": n, "t": times[len(times) // 4],
                  "loss": float(aux['loss.total'])}))
"""


def main():
    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO, "n": n, "envs": per_dev}],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            return
        rows.append(json.loads(line[-1]))
        print(rows[-1], flush=True)

    t1 = rows[0]["t"]
    print("\n| devices | envs | step ms | weak-scaling efficiency |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['n']} | {r['n'] * per_dev} | {r['t'] * 1e3:.0f} | "
              f"{t1 / r['t'] * 100:.0f}% |")
    with open("output/scaling_efficiency.json", "w") as f:
        json.dump({"per_device_envs": per_dev, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    os.makedirs("output", exist_ok=True)
    main()
