"""boardlaw_tpu — a TPU-native AlphaZero framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of andyljones/boardlaw
(the *Scaling Scaling Laws with Board Games* codebase): vectorized Hex, batched
regularized-policy MCTS, a synchronous actor-learner self-play loop, an
arena/league evaluation system with a variational-Bayes Elo solver, experiment
tracking, and multi-chip scaling over `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  envs/      — pure-functional vectorized games (world protocol)
  mcts/      — tree-as-tensors search, all under jit (no host round trips)
  models/    — flax networks + space-driven heads
  learning   — returns/targets, scan-based utilities
  train      — the actor-learner loop
  parallel/  — mesh/sharding plumbing (dp over envs, psum learner)
  pavlov/    — runs/files/stats/logs/checkpoints experiment tracking
  arena/     — head-to-head + league evaluation
  activelo/  — variational-Bayes Elo posterior + active matchmaking
"""

__version__ = "0.1.0"
