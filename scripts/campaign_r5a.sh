#!/bin/bash
# Round-5 chip campaign, part A: walk-block + write-mode sweep on the prefix
# path, the K=16-vs-K=8 equal-budget parity study (train + >=2048-game h2h),
# and the 3x3 anchor run. Run AFTER any other chip job has finished.
set -x
cd /root/repo
mkdir -p output/logs results

timeout 3600 python scripts/measure_round5.py 16384 prefix-weinsum prefix-wsel prefix-k16-wsel prefix-gtake prefix-k16-gtake \
  > output/logs/measure_round5b.log 2>&1

timeout 7200 python scripts/k_parity_study.py all --ks 8,16 \
  > output/logs/k_parity_k16.log 2>&1

timeout 1800 python scripts/anchor_study.py train \
  > output/logs/anchor3_train.log 2>&1

echo "CAMPAIGN-R5A DONE $(date)" >> output/logs/campaign_r5.log
