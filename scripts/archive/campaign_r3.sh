#!/bin/bash
# Round-3 chip campaign: run the remaining chip stages SERIALLY (one chip,
# contention skews measurements). Each stage logs to output/logs/ and is
# individually resumable; rerunning the script skips completed work
# (k_parity_study skips trained runs, scaling_study evaluate skips played
# pairs).
set -x
cd /root/repo
mkdir -p output/logs results/k_parity results/scaling

# 1. finish the 7x7 K-parity pair (train skips existing runs)
timeout 3600 python scripts/k_parity_study.py train --envs 8192 --steps 1500 \
  >> output/logs/k_parity_train.log 2>&1
timeout 1800 python scripts/k_parity_study.py compare \
  >> output/logs/k_parity_compare.log 2>&1

# 2. search variants with correct fencing (scan/pallas vs scan/xla vs grow)
timeout 3600 python scripts/measure_round3.py 16384 \
  > output/logs/measure_round3.log 2>&1

# 3. 9x9 scaling ladder (the BASELINE headline): 4 net sizes, K=8 bf16
timeout 14400 python scripts/scaling_study.py train --boardsize 9 --envs 16384 \
  --steps 1500 --sizes 64:2,128:2,256:4,512:4 --k 8 --dtype bfloat16 \
  > output/logs/scaling9_train.log 2>&1

# 4. league-evaluate the 9x9 snapshots (K=8 test search for speed)
timeout 7200 python scripts/scaling_study.py evaluate --boardsize 9 --envs-per 4 \
  --test-k 8 > output/logs/scaling9_eval.log 2>&1

# 5. fit + artifacts (CPU)
timeout 900 python scripts/run_cpu.py scripts/scaling_study.py fit --boardsize 9 \
  > output/logs/scaling9_fit.log 2>&1
cp output/experiments/scaling/fit_b9.json results/scaling/ 2>/dev/null
cp output/experiments/scaling/flops_curves_b9.png results/scaling/ 2>/dev/null
cp output/experiments/scaling/frontier_b9.csv results/scaling/ 2>/dev/null

echo "CAMPAIGN DONE $(date)" >> output/logs/campaign_r3.log
