#!/bin/bash
# Wait for TPU recovery, then run the round5e + round6a measurement batches.
cd /root/repo
for i in $(seq 1 40); do
  t0=$(date +%s)
  timeout 240 python -c "
import numpy as np, jax, jax.numpy as jnp
int(np.asarray((jnp.arange(1<<18, dtype=jnp.uint32)+jnp.uint32(7)).sum()))
print('PROBE_OK')
" 2>/dev/null | grep -q PROBE_OK
  rc=$?
  t1=$(date +%s)
  el=$((t1-t0))
  echo "probe $i rc=$rc ${el}s" 
  if [ $rc -eq 0 ] && [ $el -le 60 ]; then
    echo "chip healthy; running round5e"
    timeout 3000 python tools/tpu_round5e.py 2>&1 | grep -v WARNING | tee TPU_ROUND5E.out
    echo "running round6a"
    timeout 3000 python tools/tpu_round6a.py 2>&1 | grep -v WARNING | tee TPU_ROUND6A.out
    echo "ALL_DONE"
    exit 0
  fi
  sleep 180
done
echo "GAVE_UP"
exit 1
