#!/bin/bash
# Round-3 TPU work queue, revision 6: post-fix measurement block.
# Waits for tpu_queue5.sh, then serializes:
#   1. the a0.9 rung eval (queue5's attempt raced a mid-edit tree and
#      died on an import error) + ladder rebuild
#   2. the headline bench — first run since the bs-wide rerun fix
#      (queue5's bench tripped the bit-exactness assert on the 16-wide
#      rerun) and first measurement of the three levers together
#   3. AOT cold-start A/B: populate the executable cache, then time a
#      fresh process with and without it (VERDICT #6b done criterion:
#      cold process to first encode < 60 s)
#
# Resumable via /tmp/qdone6 markers; launch:
#   setsid nohup bash tools/tpu_queue6.sh > /tmp/tpu_queue6.log 2>&1 &

set -u
cd /root/repo
mkdir -p /tmp/qdone6

echo "[queue6] waiting for queue5 ($(date -u +%H:%M:%S))"
while ! grep -q "ALL DONE" /tmp/tpu_queue5.log 2>/dev/null; do
  sleep 30
done
echo "[queue6] queue5 done, starting ($(date -u +%H:%M:%S))"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "/tmp/qdone6/$name" ]; then
    echo "[queue6] $name already done, skipping"; return 0
  fi
  echo "[queue6] ==> $name ($(date -u +%H:%M:%S)) timeout ${tmo}s"
  timeout "$tmo" "$@" > "/tmp/q6_$name.log" 2>&1
  local rc=$?
  echo "$rc" > "/tmp/qdone6/$name"
  echo "[queue6] <== $name rc=$rc ($(date -u +%H:%M:%S))"
  tail -3 "/tmp/q6_$name.log" | sed 's/^/[queue6]    /'
  return 0
}

step eval_c3p9 2400 python -u tools/rd_eval.py models/rd/c3p \
  --config c3p --run_id c3p-a0.9 --fixed_threshold --seeds 200 201 202
step ladder 600 python -u tools/rd_ladder.py

step bench 2400 env PCC_TIMING=1 BENCH_PIPELINE=2 python -u bench.py

# batch-width A/B: q5_conv shows conv passes are dispatch-overhead-bound
# (ms/chunk FLAT from batch 8 to 128), so 128-wide chunks should halve
# the per-block device cost of syms/dec passes if HBM allows
step bench128 2400 env PCC_TIMING=1 BENCH_PIPELINE=2 BENCH_BATCH_BLOCKS=128 \
  python -u bench.py

rm -rf /tmp/aotcache
step aot_populate 1800 env PCC_AOT_CACHE=/tmp/aotcache BENCH_NUM_CLOUDS=1 \
  python -u bench.py
step aot_cold 1800 env PCC_AOT_CACHE=/tmp/aotcache BENCH_NUM_CLOUDS=1 \
  python -u bench.py
step cold_nocache 1800 env BENCH_NUM_CLOUDS=1 python -u bench.py

echo "[queue6] ALL DONE $(date -u)"
