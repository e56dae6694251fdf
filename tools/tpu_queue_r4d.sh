#!/bin/bash
# Round-4d TPU queue. Ordered by evidentiary value for the round:
#   1. d2-optimized encode on hardware (VERDICT r3 #5) at batch 128
#      (feasible after a7eda1e removed the 16 GB padded normals-grid
#      temp), falling back to batch 64 so the round is guaranteed a
#      d2 hardware number either way.
#   2. Regenerate the c2 rung from committed assets with the d2-aware
#      rd_eval (its r4c eval predates the d2 columns) + ladder rebuild.
#   3. Batch-width A/B above the current 128-block default: the
#      dispatch-floor measurements (ROUND3_NOTES:124-137) showed
#      per-block device cost halving per batch doubling up to 128;
#      probe 256, then 192 as the fallback point if 256 trips VMEM
#      limits on the synthesis slab.
#
# Shares the single TPU with tpu_queue_r4c.sh: when launched while r4c
# is still running it waits for r4c's ALL DONE (or a 45-min fully
# silent queue, i.e. r4c died) before touching the device.
#
# Launch:  setsid nohup bash tools/tpu_queue_r4d.sh > /root/.pcc_queue/r4d.out 2>&1 &

QUEUE_NAME=r4d
cd /root/repo
source tools/queue_lib.sh

wait_for_queue r4c  # from queue_lib (process-liveness aware)
wait_tunnel || exit 1

# --- 1. d2-optimized encode on hardware, with batch-64 fallback ----------
step bench_d2_128 3600 env PCC_TIMING=1 BENCH_PIPELINE=2 \
  BENCH_NUM_CLOUDS=4 BENCH_BATCH_BLOCKS=128 \
  BENCH_OPT_METRICS=d1_mse,d2_mse PCC_AOT_CACHE=/tmp/aotcache \
  python -u bench.py \
  || step bench_d2_64 3600 env PCC_TIMING=1 BENCH_PIPELINE=2 \
    BENCH_NUM_CLOUDS=4 BENCH_BATCH_BLOCKS=64 \
    BENCH_OPT_METRICS=d1_mse,d2_mse PCC_AOT_CACHE=/tmp/aotcache \
    python -u bench.py

# --- 2. c2 rung with d2 columns + ladder rebuild --------------------------
step eval_c2_d2 2400 env PCC_AOT_CACHE=/tmp/aotcache \
  python -u tools/rd_eval.py models/rd10k/c2 --config c2 --run_id c2 \
  --from-assets --fixed_threshold --seeds 200 201 202 \
  --out results/rd_c2_fixedthr.json \
  && step ladder_d2 600 python -u tools/rd_ladder.py

# --- 3. batch-width A/B ----------------------------------------------------
step bench_256 3600 env PCC_TIMING=1 PCC_AOT_CACHE=/tmp/aotcache \
  BENCH_BATCH_BLOCKS=256 python -u bench.py

step bench_192 3600 env PCC_TIMING=1 PCC_AOT_CACHE=/tmp/aotcache \
  BENCH_BATCH_BLOCKS=192 python -u bench.py

# the driver's end-of-round `python bench.py` uses bench's default
# cache path; merge the queue-warmed executables into it so that run
# is warm (entries are content-addressed, extras harmless)
step warm_default_cache 120 bash -c \
  'mkdir -p /tmp/pcc_aot_cache && cp -n /tmp/aotcache/*.aotx /tmp/pcc_aot_cache/ || true'

qlog "ALL DONE $(date -u)"
queue_status
