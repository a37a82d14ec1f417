#!/bin/bash
# Wait for TPU recovery; validate bench.py at the 2^20 default; refresh BENCH_ALL.
cd /root/repo
for i in $(seq 1 70); do
  out=$(timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
def op(): return (jnp.arange(1<<18, dtype=jnp.uint32)+jnp.uint32(7)).sum()
int(np.asarray(op()))
t0=time.perf_counter(); int(np.asarray(op())); dt=time.perf_counter()-t0
print('PROBE', round(dt,2))
" 2>/dev/null | grep PROBE)
  echo "probe $i: $out"
  secs=$(echo "$out" | awk '{print int($2)}')
  if [ -n "$out" ] && [ -n "$secs" ] && [ "$secs" -le 2 ]; then
    echo "running bench.py"
    timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -1 | tee BENCH_SELF.out
    echo "running bench_all"
    timeout 3600 python tools/bench_all.py 2>&1 | grep -v WARNING | tail -2
    if [ -s BENCH_ALL.json ]; then
      echo "ALL_DONE"
      exit 0
    fi
  fi
  sleep 200
done
echo "GAVE_UP"
exit 1
