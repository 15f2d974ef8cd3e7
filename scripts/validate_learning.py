"""Learning-signal validation: short 3x3 self-play training must show the
policy loss falling and the agent beating a random opponent.

This is the cheap stand-in for BASELINE.md's scaling-curve reproduction:
it verifies the end-to-end loop (search -> targets -> gradient) actually
improves play, on real hardware, in minutes.

Usage: python scripts/validate_learning.py [steps]
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from boardlaw_tpu.train import TrainConfig, make_train
from boardlaw_tpu.mcts import MCTSAgent
from boardlaw_tpu.models.networks import make_eval_fn
from boardlaw_tpu.arena import common
from boardlaw_tpu.envs import hex, validation


def winrate_vs_random(model, params, boardsize, n_envs=128, seed=0):
    def eval_fn(world, key=None):
        return model.apply(params, world.obs, world.valid, world.seats)

    agent = MCTSAgent(eval_fn, n_nodes=16, noise_eps=0.0)
    inner = validation.RandomAgent()

    def rand_agent(world, key, eval=False):
        d = inner(world)
        return {**d, "actions": jax.random.categorical(key, d["logits"], axis=-1)}

    world = hex.Hex.initial(n_envs, boardsize)
    results = common.evaluate(
        world, {"net": agent, "rand": rand_agent}, key=jax.random.PRNGKey(seed)
    )
    wins = games = 0.0
    for r in results:
        for name, w in zip(r["names"], r["wins"]):
            games += w
            if name == "net":
                wins += w
    return wins / max(games, 1)


def main(steps=60, leaves_per_pass=1):
    """leaves_per_pass > 1 validates the batched multi-leaf search (and its
    accelerated solver) end to end — e.g. `validate_learning.py 60 4`.
    Measured on CPU at K=4: policy loss 1.70->1.41, winrate vs random
    69%->80% in 60 steps."""
    cfg = TrainConfig(
        boardsize=3, width=16, depth=2, n_envs=512, buffer_len=16,
        n_nodes=16, mix_steps=64, lr=3e-3, leaves_per_pass=leaves_per_pass,
    )
    model, opt, init, warmup, train_step = make_train(cfg)
    state = warmup(init(jax.random.PRNGKey(0)))

    wr0 = winrate_vs_random(model, state.params, cfg.boardsize, seed=1)
    print(f"winrate vs random before training: {wr0:.2%}")

    losses = []
    t0 = time.time()
    for i in range(steps):
        state, aux = train_step(state)
        losses.append(float(aux["loss.policy"]))
        if (i + 1) % 20 == 0:
            print(f"step {i+1}: policy loss {losses[-1]:.3f}, "
                  f"value loss {float(aux['loss.value']):.3f}")
    print(f"{steps} steps in {time.time()-t0:.0f}s")

    wr1 = winrate_vs_random(model, state.params, cfg.boardsize, seed=2)
    print(f"winrate vs random after training:  {wr1:.2%}")

    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    print(f"policy loss {early:.3f} -> {late:.3f}")
    ok = (late < early) and (wr1 >= wr0)
    print("LEARNING OK" if ok else "LEARNING NOT DEMONSTRATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 60,
                  int(sys.argv[2]) if len(sys.argv) > 2 else 1))
