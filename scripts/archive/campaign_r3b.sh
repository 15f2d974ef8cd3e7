#!/bin/bash
# Round-3 chip campaign, part 2 (run after campaign_r3.sh finishes):
# grow+pallas search variant, device trace of the production pass,
# the config-4 external-arena 9x9 run, and the final bench.
set -x
cd /root/repo
mkdir -p output/logs results

# 6. grow + pallas-walk variant (8 Mosaic walk compiles, one per subtree R)
timeout 5400 python scripts/measure_round3.py 16384 grow-pallas \
  > output/logs/measure_round3b.log 2>&1

# 7. device trace of the production (scan+pallas) pass for the roofline gap
timeout 3600 python scripts/trace_multi.py 16384 \
  > output/logs/trace_multi_r3.log 2>&1

# 8. BASELINE config 4: 9x9 train with external gtphex arena + activelo
timeout 7200 python scripts/arena9_run.py 2000 \
  > output/logs/arena9_run.log 2>&1

# 9. final bench
timeout 3600 python bench.py > output/logs/bench_r3_final.log 2>&1

echo "CAMPAIGN-B DONE $(date)" >> output/logs/campaign_r3.log
