#!/bin/bash
# Round-4 TPU work queue (uses tools/queue_lib.sh — see there for the
# marker/retry semantics that replaced the tpu_queue{1..8} one-shots).
#
# Goals (VERDICT r3 "next round"):
#   1. Durable ladder rungs: retrain c2 and c3p-a0.9 (their r3
#      checkpoints died with the 06:12 reboot, so the committed RD JSONs
#      were unreproducible), re-eval fixed-thr, export committed assets.
#      a0.9 is also the broken rung (landed below c2); the retrain is
#      the repair attempt at the budget-matched 4k+1.5k protocol.
#   2. d2-optimized encode on hardware (BENCH_OPT_METRICS=d1_mse,d2_mse).
#   3. Flagship c3p-a0.75 toward the reference protocol: 50k base +
#      10k ft with early-stop patience 4000 and best-val checkpoints
#      (tr_train.py:54-57 analogue), then the adaptive eval that anchors
#      the headline BD numbers; export assets; rebuild the ladder.
#
# Launch:  setsid nohup bash tools/tpu_queue_r4.sh > /root/.pcc_queue/r4.out 2>&1 &
# Status:  bash -c 'QUEUE_NAME=r4 source tools/queue_lib.sh; queue_status'

QUEUE_NAME=r4
cd /root/repo
source tools/queue_lib.sh

wait_tunnel || exit 1

AOT="env PCC_AOT_CACHE=/tmp/aotcache"

# --- 1a. c2 rung: retrain (budget-matched trimmed protocol) + eval ------
step train_c2 4800 $AOT python -u tools/rd_train_all.py --config c2 \
  --base_steps 4000 --ft_steps 1500 --lambdas 2e-4 5e-5 1e-5 \
  && step eval_c2 2400 $AOT python -u tools/rd_eval.py --config c2 \
    --fixed_threshold --seeds 200 201 202 \
  && step export_c2 600 python -u tools/export_rd_assets.py --runs c2

# --- 1b. a0.9 rung repair: retrain + eval (alpha 0.9 -> run dir 'c3p') --
step train_a09 4800 $AOT python -u tools/rd_train_all.py --config c3p \
  --alpha 0.9 --base_steps 4000 --ft_steps 1500 --lambdas 3e-4 5e-5 1e-5 \
  && step eval_a09 2400 $AOT python -u tools/rd_eval.py models/rd/c3p \
    --config c3p --run_id c3p-a0.9 --fixed_threshold --seeds 200 201 202 \
  && step export_a09 600 python -u tools/export_rd_assets.py --runs c3p

step ladder1 600 python -u tools/rd_ladder.py

# --- 2. d2-optimized encode on hardware (VERDICT r3 #5) ------------------
step bench_d2 3600 env PCC_TIMING=1 BENCH_PIPELINE=2 BENCH_NUM_CLOUDS=4 \
  BENCH_BATCH_BLOCKS=128 BENCH_OPT_METRICS=d1_mse,d2_mse \
  PCC_AOT_CACHE=/tmp/aotcache python -u bench.py

# --- 3. flagship toward protocol + the headline adaptive eval ------------
# 40k base (was 30k in r3) + 8k ft with early-stop patience 4000 and
# best-val checkpoints — sized so the whole queue fits the round
step train_flagship 14400 $AOT python -u tools/rd_train_all.py \
  --config c3p --base_steps 40000 --ft_steps 8000 --patience_steps 4000 \
  --lambdas 3e-4 1e-4 5e-5 2e-5 1e-5 \
  && step eval_flagship 3600 $AOT python -u tools/rd_eval.py \
    models/rd/c3p-a0.75 --config c3p --run_id c3p-a0.75 \
    --out results/rd_c3p_a075.json --seeds 200 201 202 203 \
  && step export_flagship 900 python -u tools/export_rd_assets.py \
    --runs c3p-a0.75 \
  && step ladder2 600 python -u tools/rd_ladder.py

# --- 4. consolidated final bench at the round's settings -----------------
step bench_final 2400 env PCC_TIMING=1 BENCH_PIPELINE=2 \
  BENCH_BATCH_BLOCKS=128 PCC_AOT_CACHE=/tmp/aotcache python -u bench.py

qlog "ALL DONE $(date -u)"
queue_status
