#!/bin/bash
# Round-5 endgame (run after the flagship run is stopped): league-evaluate
# the fresh 9x9 runs, refit the frontier, seed-repeat gap, reference
# overlay, arena evidence collection, final bench.
set -x
cd /root/repo
mkdir -p output/logs results/scaling

timeout 5400 python scripts/scaling_study.py evaluate --boardsize 9 \
  --test-k 8 --envs-per 4 > output/logs/league_eval_r5.log 2>&1

timeout 1200 python scripts/scaling_study.py fit --boardsize 9 \
  > output/logs/fit_b9_r5.log 2>&1
cp output/experiments/scaling/frontier_b9.csv results/scaling/frontier_b9.csv
cp output/experiments/scaling/fit_b9.json results/scaling/fit_b9.json
cp output/experiments/scaling/flops_curves_b9.png results/scaling/flops_curves_b9.png

timeout 1200 python scripts/scaling_study.py gap --boardsize 9 \
  > output/logs/gap_b9_r5.log 2>&1

timeout 600 python scripts/ref_overlay.py > output/logs/ref_overlay_r5.log 2>&1

timeout 600 python scripts/collect_flagship.py > output/logs/collect_flagship.log 2>&1

timeout 3600 python bench.py > output/logs/bench_r5.log 2>&1

echo "CAMPAIGN-R5C DONE $(date)" >> output/logs/campaign_r5.log
