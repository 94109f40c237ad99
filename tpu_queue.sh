#!/bin/bash
# Patient TPU measurement queue (round 3). One client, no kills: blocks on the
# axon session claim until the wedge clears, then runs the device shard and
# the benchmark. Logs to /tmp/tpu_queue.log.
set -x
cd /root/repo
date
python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
print("devices:", jax.devices(), flush=True)
x = jnp.ones((128, 128))
print("matmul:", float((x @ x).sum()), "claim wait s:", time.time() - t0, flush=True)
EOF
date
echo "=== device test shard ==="
TRAJOPT_TEST_TPU=1 python -m pytest tests/test_tpu.py -q -x --no-header 2>&1
date
echo "=== bench ==="
python bench.py 2>&1 | tee /tmp/bench_r3.out
date
echo "QUEUE DONE"
