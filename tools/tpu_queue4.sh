#!/bin/bash
# Round-3 TPU work queue, revision 4: uniform TRIMMED ladder protocol
# sized to the remaining session window (one real chip, measured
# 3.2-4.5 it/s on c1 at batch 32).
#
# Uniformity is the point: all four rungs train 4k base + 1.5k warm-seq
# fine-tune per λ, 3 λs spanning each reference grid, and evaluate with
# the SAME fixed-threshold protocol on the SAME 3 held-out clouds — so
# rung-to-rung BD deltas are a controlled comparison (the r2 flagship
# curve in results/rd_c3p_a075.json was 30k+10k with optimal thresholds
# and remains the RD artifact).
#
# Resumable via /tmp/qdone3 markers; launch:
#   bash tools/tpu_queue4.sh > /tmp/tpu_queue4.log 2>&1 &

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

TRIM="--base_steps 4000 --ft_steps 1500"
L12="--lambdas 2e-4 5e-5 1e-5"
L3P="--lambdas 3e-4 5e-5 1e-5"
EV="--fixed_threshold --seeds 200 201 202"
step train_c1   3600 python -u tools/rd_train_all.py --config c1 $TRIM $L12
step eval_c1    2400 python -u tools/rd_eval.py --config c1 $EV
step train_c2   3600 python -u tools/rd_train_all.py --config c2 $TRIM $L12
step eval_c2    2400 python -u tools/rd_eval.py --config c2 $EV
step train_c3p9 4800 python -u tools/rd_train_all.py --config c3p --alpha 0.9 $TRIM $L3P
step eval_c3p9  2400 python -u tools/rd_eval.py --config c3p --run_id c3p-a0.9 $EV
step train_c3pA 4800 python -u tools/rd_train_all.py --config c3p $TRIM $L3P
step eval_c3pA  2400 python -u tools/rd_eval.py --config c3p $EV
step ladder     600  python -u tools/rd_ladder.py

echo "[queue] ALL DONE $(date -u)"
