#!/bin/bash
# Patient TPU measurement queue (round 3), v2: retry the backend probe in a
# loop (each attempt itself blocks on the session claim; UNAVAILABLE errors
# sleep and retry), then run the device shard and the benchmark.
# One client at a time; never killed mid-flight.  Logs to /tmp/tpu_queue.log.
set -x
cd /root/repo
for attempt in $(seq 1 24); do
  date
  if python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
print("devices:", jax.devices(), flush=True)
x = jnp.ones((128, 128))
print("matmul:", float((x @ x).sum()), "claim wait s:", time.time() - t0, flush=True)
EOF
  then
    echo "PROBE OK on attempt $attempt"
    break
  fi
  echo "probe attempt $attempt failed; sleeping 180s"
  sleep 180
done
date
echo "=== device test shard ==="
TRAJOPT_TEST_TPU=1 python -m pytest tests/test_tpu.py -q --no-header 2>&1
date
echo "=== bench ==="
python bench.py 2>&1 | tee /tmp/bench_r3.out
date
echo "QUEUE DONE"
