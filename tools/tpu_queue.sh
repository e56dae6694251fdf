#!/bin/bash
# Serial TPU work queue for round 3 (the axon tunnel serves ONE client).
#
# Run by tools/tpu_supervisor.sh the moment the backend answers, or by
# hand:  setsid nohup bash tools/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
#
# Order = VERDICT r3 priorities: measure first (ROUND2_NOTES plan), then
# the config-ladder training + eval, then the AOT experiment. Every step
# logs to /tmp/q_<name>.log and the queue continues on failure.

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

# ---- 2. config-ladder training (VERDICT #3) -------------------------------
# warm-seq chains inside each config; done markers make reruns resume
step train_c1    14400 python -u tools/rd_train_all.py --config c1
step train_c2    14400 python -u tools/rd_train_all.py --config c2
step train_c3p9  14400 python -u tools/rd_train_all.py --config c3p --alpha 0.9
# extend the flagship toward the 100k-step protocol (VERDICT weak #2)
step extend_c3p  21600 python -u tools/rd_train_all.py --config c3p --extend 20000

# ---- 3. ladder eval + report ----------------------------------------------
# published c1..c4 rungs use the reference's FIXED-threshold protocol;
# the adaptive flagship curve (c5/c6 rung) is re-evaluated last
step eval_c1     7200 python -u tools/rd_eval.py --config c1 --fixed_threshold
step eval_c2     7200 python -u tools/rd_eval.py --config c2 --fixed_threshold
step eval_c3p9   7200 python -u tools/rd_eval.py --config c3p --run_id c3p-a0.9 --fixed_threshold
step eval_c3pf   7200 python -u tools/rd_eval.py --config c3p --fixed_threshold
step eval_c3p    5400 python -u tools/rd_eval.py --config c3p
step ladder      600  python -u tools/rd_ladder.py

# ---- 4. AOT export attempt (VERDICT #6b) ----------------------------------
step aot         2400 python -u tools/aot_export.py

echo "[queue] ALL DONE $(date -u)"
