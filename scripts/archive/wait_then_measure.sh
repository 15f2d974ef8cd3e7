#!/bin/bash
# Poll the axon backend with a trivial jit until it recovers, then run the
# consolidated round-2 measurement sweep. All output to the log file.
cd /root/repo
LOG=/tmp/chip_measure.log
echo "[$(date)] polling for backend recovery" >> $LOG
while true; do
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda x: x*2)(jnp.ones(8)); x.block_until_ready()
print('backend up:', jax.devices())
" >> $LOG 2>&1
  if [ $? -eq 0 ]; then break; fi
  echo "[$(date)] still down, retrying in 120s" >> $LOG
  sleep 120
done
echo "[$(date)] backend recovered; running measure_round2" >> $LOG
timeout 3000 python scripts/measure_round2.py >> $LOG 2>&1
echo "[$(date)] measure_round2 done (exit $?)" >> $LOG
echo "[$(date)] running trace_multi" >> $LOG
timeout 2400 python scripts/trace_multi.py >> $LOG 2>&1
echo "[$(date)] trace_multi done (exit $?)" >> $LOG
