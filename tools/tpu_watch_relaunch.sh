#!/bin/bash
# Poll the axon tunnel (tiny fetch under a hard timeout); on first
# success, relaunch tpu_queue6.sh (markers make it resume cleanly) and
# exit. Logs attempts to stdout.
set -u
cd /root/repo
for i in $(seq 1 60); do
  echo "[watch] attempt $i $(date -u +%H:%M:%S)"
  if timeout 240 python -u - <<'PY' 2>/dev/null
import numpy as np, jax, jax.numpy as jnp
assert float(np.asarray(jnp.zeros(8) + 1.0).sum()) == 8.0
print("fetch ok")
PY
  then
    echo "[watch] tunnel OK, relaunching queue6 $(date -u)"
    setsid nohup bash tools/tpu_queue6.sh > /tmp/tpu_queue6.log 2>&1 < /dev/null &
    exit 0
  fi
  sleep 120
done
echo "[watch] gave up $(date -u)"
