#!/bin/bash
# Wait for the axon TPU backend to answer, then run the round-3 queue.
# Launch:  setsid nohup bash tools/tpu_supervisor.sh > /tmp/tpu_sup.log 2>&1 &
# Probe init can hang (not fail) for >25 min during outages, so each
# attempt runs under timeout and the loop just retries.

set -u
cd /root/repo

while true; do
  echo "[sup] probe attempt $(date -u +%H:%M:%S)"
  if timeout -k 30 900 python -u tools/tpu_probe.py 1 > /tmp/tpu_probe_once.log 2>&1; then
    echo "[sup] TPU is UP:"
    tail -2 /tmp/tpu_probe_once.log
    break
  fi
  echo "[sup] still down (rc=$?); sleeping 240"
  tail -1 /tmp/tpu_probe_once.log
  sleep 240
done

echo "[sup] starting queue $(date -u)"
bash tools/tpu_queue.sh
echo "[sup] queue finished $(date -u)"
