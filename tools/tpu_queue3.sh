#!/bin/bash
# Round-3 TPU work queue, revision 3 (the axon tunnel serves ONE client).
#
# Ordered for this session: the ladder training rungs (r2 checkpoints were
# lost with the container) run unattended while the interactive session
# iterates on encode-overhead fixes on CPU; each rung trains+evals together
# so a partial run still yields ladder rows. Done-markers in /tmp/qdone3
# make it resumable; launch with
#   setsid nohup bash tools/tpu_queue3.sh > /tmp/tpu_queue3.log 2>&1 &

set -u
cd /root/repo
mkdir -p /tmp/qdone3

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "/tmp/qdone3/$name" ]; then
    echo "[queue] $name already done, skipping"; return 0
  fi
  echo "[queue] ==> $name ($(date -u +%H:%M:%S)) timeout ${tmo}s"
  timeout "$tmo" "$@" > "/tmp/q3_$name.log" 2>&1
  local rc=$?
  echo "$rc" > "/tmp/qdone3/$name"
  echo "[queue] <== $name rc=$rc ($(date -u +%H:%M:%S))"
  tail -3 "/tmp/q3_$name.log" | sed 's/^/[queue]    /'
  return 0
}

# ---- ladder rungs: train then eval, cheapest architecture first ----------
step train_c1    14400 python -u tools/rd_train_all.py --config c1
step eval_c1     7200 python -u tools/rd_eval.py --config c1 --fixed_threshold
step train_c2    14400 python -u tools/rd_train_all.py --config c2
step eval_c2     7200 python -u tools/rd_eval.py --config c2 --fixed_threshold
step train_c3p9  14400 python -u tools/rd_train_all.py --config c3p --alpha 0.9
step eval_c3p9   7200 python -u tools/rd_eval.py --config c3p --run_id c3p-a0.9 --fixed_threshold
step train_c3pA  14400 python -u tools/rd_train_all.py --config c3p
step eval_c3pf   7200 python -u tools/rd_eval.py --config c3p --fixed_threshold
step ladder      600  python -u tools/rd_ladder.py
# adaptive flagship curve refresh
step eval_c3p    5400 python -u tools/rd_eval.py --config c3p

echo "[queue] ALL DONE $(date -u)"
