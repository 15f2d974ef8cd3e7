#!/bin/bash
# Round-5 chip campaign, part D: retrain the 3x3 anchor (time storer), then
# hand the chip to the long flagship run for FLAGSHIP_TIMEOUT seconds.
set -x
cd /root/repo
mkdir -p output/logs results

timeout 1200 python scripts/anchor_study.py train > output/logs/anchor3_train.log 2>&1

timeout ${FLAGSHIP_TIMEOUT:-21600} python scripts/flagship_b9.py \
  > output/logs/flagship_b9.log 2>&1

echo "CAMPAIGN-R5D DONE $(date)" >> output/logs/campaign_r5.log
