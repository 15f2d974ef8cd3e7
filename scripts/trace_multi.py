"""Capture a device trace of one multi-leaf pass (and one K=1 simulate) on
the chip, then summarize per-op durations from the emitted trace.json.gz."""
import sys, os, glob, gzip, json, time, collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp

from boardlaw_tpu.envs import hex
from boardlaw_tpu.mcts import search
from boardlaw_tpu.train import TrainConfig, build_model

LOGDIR = "/tmp/mcts_trace"


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024
    grow = len(sys.argv) > 2 and sys.argv[2] == "grow"
    K = 8
    cfg = TrainConfig(boardsize=9, width=512, depth=4, n_nodes=64,
                      dtype="bfloat16", tree_dtype="bfloat16", use_pallas=False,
                      leaves_per_pass=K, grow_passes=grow)
    mcfg = cfg.mcts_config()
    model = build_model(cfg)
    world = hex.Hex.initial(n_envs, cfg.boardsize)
    params = model.init(jax.random.PRNGKey(0), world.obs, world.valid, world.seats)

    def eval_fn(w, key=None):
        return model.apply(params, w.obs, w.valid, w.seats)

    @jax.jit
    def build_tree(world, key):
        k_init, k_sims = jax.random.split(key)
        tree = search.build(world, mcfg)
        tree = search.initialize(tree, eval_fn(world, None), k_init, mcfg, world.valid)

        def body(tree, k):
            return search.simulate_multi(tree, eval_fn, k, mcfg), None

        tree, _ = jax.lax.scan(body, tree, jax.random.split(k_sims, 3))
        return tree

    @jax.jit
    def one_pass(tree, key):
        def body(tree, k):
            return search.simulate_multi(tree, eval_fn, k, mcfg), None
        tree, _ = jax.lax.scan(body, tree, jax.random.split(key, 4))
        return tree.n

    if grow:
        # the grow path unrolls per-pass shapes — trace the FULL 64-node
        # search instead of a 4-pass scan window
        @jax.jit
        def one_pass(world, key):
            return search.mcts(world, eval_fn, key, mcfg).n

        out = one_pass(world, jax.random.PRNGKey(2))  # compile
        float(out.sum())
        print("warm; tracing (full grow search)...", flush=True)
        jax.profiler.start_trace(LOGDIR)
        out = one_pass(world, jax.random.PRNGKey(3))
        float(out.sum())
        jax.profiler.stop_trace()
    else:
        tree = build_tree(world, jax.random.PRNGKey(1))
        jax.block_until_ready(tree.n)
        out = one_pass(tree, jax.random.PRNGKey(2))  # compile
        jax.block_until_ready(out)
        print("warm; tracing...", flush=True)

        jax.profiler.start_trace(LOGDIR)
        out = one_pass(tree, jax.random.PRNGKey(3))
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
    print("trace captured", flush=True)

    files = glob.glob(f"{LOGDIR}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("NO trace.json.gz; files:", glob.glob(f"{LOGDIR}/**/*", recursive=True))
        return
    f = max(files, key=os.path.getmtime)
    ev = json.load(gzip.open(f))["traceEvents"]
    tot = collections.Counter()
    cnt = collections.Counter()
    scopes = collections.Counter()
    SCOPES = ("solve", "sample", "walk", "gather", "envstep", "eval",
              "writes", "backup", "transpose")
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            blob = name + " " + json.dumps(e.get("args", {}))
            tot[name] += e["dur"]
            cnt[name] += 1
            for s in SCOPES:
                if f"{s}/" in blob or f"/{s}" in blob:
                    scopes[s] += e["dur"]
                    break
            else:
                if name.startswith(("while", "jit_", "$", "concatenate",
                                    "dynamic-update", "closed_call", "fusion",
                                    "reduce-window", "convolution", "copy")):
                    scopes["<unattributed:" + name.split(".")[0] + ">"] += e["dur"]
    label = "full 8-pass grow search" if grow else "1 program of 4 passes"
    print(f"\nscope totals ({label}, {n_envs} envs, K={K}):")
    for name, us in scopes.most_common(25):
        print(f"{us/1e3:10.2f} ms  {name}")
    print("\ntop ops:")
    for name, us in tot.most_common(30):
        print(f"{us/1e3:10.2f} ms  x{cnt[name]:<5d} {name[:110]}")
    # show a sample event's args to confirm metadata fields
    for e in ev:
        if e.get("ph") == "X" and e.get("args") and "fusion" in e.get("name", ""):
            print("\nsample args:", json.dumps(e["args"])[:600])
            break


if __name__ == "__main__":
    main()
