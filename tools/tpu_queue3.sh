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
# Uniform TRIMMED protocol (one real chip, ~5 steps/s): 10k base + 4k
# warm-seq fine-tune per λ, 3 λs per rung spanning each reference grid.
# All four rungs identical protocol => rung-to-rung BD deltas stay a
# controlled comparison (the r2 flagship curve in results/ was 30k+10k
# and is kept separately as the RD artifact).
TRIM="--base_steps 10000 --ft_steps 4000"
L12="--lambdas 2e-4 5e-5 1e-5"
L3P="--lambdas 3e-4 5e-5 1e-5"
step train_c1    9000 python -u tools/rd_train_all.py --config c1 $TRIM $L12
step eval_c1     5400 python -u tools/rd_eval.py --config c1 --fixed_threshold
step train_c2    9000 python -u tools/rd_train_all.py --config c2 $TRIM $L12
step eval_c2     5400 python -u tools/rd_eval.py --config c2 --fixed_threshold
step train_c3p9  12000 python -u tools/rd_train_all.py --config c3p --alpha 0.9 $TRIM $L3P
step eval_c3p9   5400 python -u tools/rd_eval.py --config c3p --run_id c3p-a0.9 --fixed_threshold
step train_c3pA  12000 python -u tools/rd_train_all.py --config c3p $TRIM $L3P
step eval_c3pf   5400 python -u tools/rd_eval.py --config c3p --fixed_threshold
step eval_c3p    5400 python -u tools/rd_eval.py --config c3p
step ladder      600  python -u tools/rd_ladder.py

echo "[queue] ALL DONE $(date -u)"
