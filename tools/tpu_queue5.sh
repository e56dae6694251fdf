#!/bin/bash
# Round-3 TPU work queue, revision 5: post-ladder measurement block.
# Waits for tpu_queue4.sh (the RD ladder) to finish, then serializes the
# three measurement jobs on the single chip:
#   1. clean re-bench (the three post-30.6 levers — rerun@16, native
#      unpack, rANS decode LUT — have never been measured together)
#   2. conv-pass MFU table (VERDICT #2 decision data)
#   3. slab/whole fused-kernel hardware check at highest matmul precision
#
# Resumable via /tmp/qdone5 markers; launch:
#   setsid nohup bash tools/tpu_queue5.sh > /tmp/tpu_queue5.log 2>&1 &

set -u
cd /root/repo
mkdir -p /tmp/qdone5

echo "[queue5] waiting for queue4 ($(date -u +%H:%M:%S))"
while ! grep -q "ALL DONE" /tmp/tpu_queue4.log 2>/dev/null; do
  sleep 30
done
echo "[queue5] queue4 done, starting ($(date -u +%H:%M:%S))"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "/tmp/qdone5/$name" ]; then
    echo "[queue5] $name already done, skipping"; return 0
  fi
  echo "[queue5] ==> $name ($(date -u +%H:%M:%S)) timeout ${tmo}s"
  timeout "$tmo" "$@" > "/tmp/q5_$name.log" 2>&1
  local rc=$?
  echo "$rc" > "/tmp/qdone5/$name"
  echo "[queue5] <== $name rc=$rc ($(date -u +%H:%M:%S))"
  tail -3 "/tmp/q5_$name.log" | sed 's/^/[queue5]    /'
  return 0
}

# Fix-up: queue4's eval_c3p9 looked in models/rd/c3p-a0.9 but the
# trainer's run-id rule (alpha==0.9 -> bare config name) saved the a0.9
# checkpoints to models/rd/c3p. Re-run the eval against the right root,
# then rebuild the ladder table with all five rungs present.
step eval_c3p9fix 2400 python -u tools/rd_eval.py models/rd/c3p \
  --config c3p --run_id c3p-a0.9 --fixed_threshold --seeds 200 201 202
step ladder2 600 python -u tools/rd_ladder.py

step bench 2400 env PCC_TIMING=1 BENCH_PIPELINE=2 python -u bench.py
step conv  1800 python -u tools/profile_conv.py --config c3p
step slab  1800 python -u tools/check_slab_tpu.py
# A/B: fused Pallas conv backend end-to-end on a reduced cloud set
# (same protocol otherwise; compare blocks/s + PCC_TIMING phases vs
# the xla-backend run above on its first 3 clouds)
step benchpl 1800 env PCC_TIMING=1 BENCH_PIPELINE=2 BENCH_NUM_CLOUDS=3 \
  BENCH_CONV_BACKEND=pallas python -u bench.py

echo "[queue5] ALL DONE $(date -u)"
