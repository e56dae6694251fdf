#!/bin/bash
# Round-3 TPU work queue, revision 2 (the axon tunnel serves ONE client).
#
# Reordered after the r3 session found the r2 training checkpoints did
# not survive the container: quick decision-data steps (conv MFU table,
# AOT experiment) run before the multi-hour ladder retraining, and each
# ladder rung is trained+evaled together so a partial run still yields
# ladder rows. Done-markers in /tmp/qdone make it resumable; launch with
#   setsid nohup bash tools/tpu_queue2.sh > /tmp/tpu_queue2.log 2>&1 &

set -u
cd /root/repo
mkdir -p /tmp/qdone

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "/tmp/qdone/$name" ]; then
    echo "[queue] $name already done, skipping"; return 0
  fi
  echo "[queue] ==> $name ($(date -u +%H:%M:%S)) timeout ${tmo}s"
  timeout "$tmo" "$@" > "/tmp/q_$name.log" 2>&1
  local rc=$?
  echo "$rc" > "/tmp/qdone/$name"
  echo "[queue] <== $name rc=$rc ($(date -u +%H:%M:%S))"
  tail -3 "/tmp/q_$name.log" | sed 's/^/[queue]    /'
  return 0
}

# ---- 1. measurement plan (ROUND2_NOTES.md) --------------------------------
step sortops     2400 python -u tools/profile_sortops.py
step bench_timed 3000 env PCC_TIMING=1 BENCH_PIPELINE=2 python -u bench.py
step bench_hb16  2400 env BENCH_HALO_BATCH=16 python -u bench.py
step bench_bb128 2400 env BENCH_BATCH_BLOCKS=128 python -u bench.py
step prof_encode 2400 python -u tools/profile_encode.py

# ---- 2. quick decision data (VERDICT #2 and #6b) --------------------------
step prof_conv   2400 python -u tools/profile_conv.py
step aot         2400 python -u tools/aot_export.py
# re-measure with the FIXED bucket kernel (the first bench_timed ran
# before the Mosaic block-shape fix landed and demoted to the EDT sweep)
step bench_timed2 3000 env PCC_TIMING=1 BENCH_PIPELINE=2 python -u bench.py

# ---- 3. ladder rungs: train then eval, cheapest architecture first --------
# (r2 checkpoints were lost with the container; every rung retrains at the
# r2 protocol 30k+10k so rung-to-rung deltas stay comparable)
step train_c1    14400 python -u tools/rd_train_all.py --config c1
step eval_c1     7200 python -u tools/rd_eval.py --config c1 --fixed_threshold
step train_c2    14400 python -u tools/rd_train_all.py --config c2
step eval_c2     7200 python -u tools/rd_eval.py --config c2 --fixed_threshold
step train_c3p9  14400 python -u tools/rd_train_all.py --config c3p --alpha 0.9
step eval_c3p9   7200 python -u tools/rd_eval.py --config c3p --run_id c3p-a0.9 --fixed_threshold
step train_c3pA  14400 python -u tools/rd_train_all.py --config c3p
step eval_c3pf   7200 python -u tools/rd_eval.py --config c3p --fixed_threshold
step ladder      600  python -u tools/rd_ladder.py
# adaptive flagship curve refresh (r2 data already in results/, so last)
step eval_c3p    5400 python -u tools/rd_eval.py --config c3p

echo "[queue] ALL DONE $(date -u)"
