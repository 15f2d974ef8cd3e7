#!/bin/bash
# Round-5 final-session chip campaign (self-driving; the container's output/
# dir was wiped between sessions, so the chip evidence is rebuilt here):
#   1. 3x3 anchor run (VERDICT #6), then its CPU-side measure concurrently
#   2. 9x9 128x2 seed pair (VERDICT #7 seed repeat at the headline board)
#   3. flagship 512x4 32k-env run with external arena, budgeted to the wall
#      (VERDICT #3 frontier extension + #5 rising elo-arena curve)
#   4. league eval + frontier fit + seed gap + reference overlay + collection
# Every stage is under `timeout` and resumable; artifacts land in results/.
set -x
cd /root/repo
mkdir -p output/logs results/scaling results/anchor3

END_TS=${END_TS:-1787263989}   # driver round end (~4h after session restart)
EVAL_RESERVE=3000              # league eval + fit + gap + overlay + collect

note() { echo "$1 $(date +%s) $(date)" >> output/logs/campaign_r5e.log; }

note "start"

timeout 1200 python scripts/anchor_study.py train \
  > output/logs/anchor3_train.log 2>&1
note "anchor-train"

# anchor measure is CPU-pinned: run it beside the chip jobs
nohup timeout 7200 python scripts/anchor_study.py measure --cpu \
  > output/logs/anchor3_measure.log 2>&1 &

timeout 2100 python scripts/scaling_study.py train --boardsize 9 --envs 8192 \
  --steps 3000 --sizes 128:2 --k 8 --dtype bfloat16 --seed 0 \
  > output/logs/b9_128x2_s0.log 2>&1
note "b9-s0"

timeout 2100 python scripts/scaling_study.py train --boardsize 9 --envs 8192 \
  --steps 3000 --sizes 128:2 --k 8 --dtype bfloat16 --seed 1 \
  > output/logs/b9_128x2_s1.log 2>&1
note "b9-s1"

NOW=$(date +%s)
BUDGET=$(( END_TS - NOW - EVAL_RESERVE ))
if [ "$BUDGET" -gt 900 ]; then
  # ~700s of compile + ~0.65s/step steady state
  STEPS=$(( (BUDGET - 700) * 100 / 65 ))
  note "flagship-budget ${BUDGET}s ${STEPS}steps"
  timeout "$BUDGET" python scripts/flagship_b9.py "$STEPS" \
    > output/logs/flagship_b9.log 2>&1
fi
note "flagship"

timeout 1900 python scripts/scaling_study.py evaluate --boardsize 9 \
  --test-k 8 --envs-per 4 > output/logs/league_eval_r5.log 2>&1
note "league-eval"

timeout 600 python scripts/scaling_study.py fit --boardsize 9 \
  > output/logs/fit_b9_r5.log 2>&1
cp output/experiments/scaling/frontier_b9.csv results/scaling/ 2>/dev/null
cp output/experiments/scaling/fit_b9.json results/scaling/ 2>/dev/null
cp output/experiments/scaling/flops_curves_b9.png results/scaling/ 2>/dev/null

timeout 600 python scripts/scaling_study.py gap --boardsize 9 \
  > output/logs/gap_b9_r5.log 2>&1

timeout 600 python scripts/ref_overlay.py > output/logs/ref_overlay_r5.log 2>&1

timeout 600 python scripts/collect_flagship.py > output/logs/collect_flagship.log 2>&1
note "CAMPAIGN-R5E-DONE"
