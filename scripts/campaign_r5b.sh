#!/bin/bash
# Round-5 chip campaign, part B (run after campaign_r5a + the K promotion
# decision): rebuild the 9x9 frontier league with FRESH runs (the round-3
# league's run dirs are gone — only its committed CSV survives), including a
# seed-repeat pair at 128x2 (r4 VERDICT #7), measure the 11x11 flagship
# shape (#9), then hand the chip to the long 512x4 flagship run (#3/#5),
# launched separately so its budget is the rest of the round.
set -x
cd /root/repo
mkdir -p output/logs results
K=${K_DEFAULT:-8}

timeout 2400 python scripts/scaling_study.py train --boardsize 9 --envs 8192 \
  --steps 2500 --sizes 64:2 --k $K --dtype bfloat16 --seed 0 \
  > output/logs/b9_64x2.log 2>&1

timeout 2400 python scripts/scaling_study.py train --boardsize 9 --envs 8192 \
  --steps 3000 --sizes 128:2 --k $K --dtype bfloat16 --seed 0 \
  > output/logs/b9_128x2_s0.log 2>&1

timeout 2400 python scripts/scaling_study.py train --boardsize 9 --envs 8192 \
  --steps 3000 --sizes 128:2 --k $K --dtype bfloat16 --seed 1 \
  > output/logs/b9_128x2_s1.log 2>&1

timeout 3600 python scripts/scaling_study.py train --boardsize 9 --envs 8192 \
  --steps 3000 --sizes 256:4 --k $K --dtype bfloat16 --seed 0 \
  > output/logs/b9_256x4.log 2>&1

timeout 3000 python scripts/trace_multi.py 16384 grow > output/logs/trace_r5.log 2>&1

timeout 3000 python scripts/measure_11x11.py > output/logs/measure_11x11.log 2>&1

echo "CAMPAIGN-R5B DONE $(date)" >> output/logs/campaign_r5.log
