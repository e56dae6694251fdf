#!/bin/bash
# Round-4d TPU queue: batch-width A/B above the current 128-block
# default. The dispatch-floor measurements (ROUND3_NOTES:124-137) showed
# per-block device cost halving per batch doubling up to 128; this
# probes 256 (and 192 as the fallback point if 256 trips VMEM limits on
# the synthesis slab). Launch AFTER tpu_queue_r4c.sh finishes — the
# queues share the single TPU.
#
# Launch:  setsid nohup bash tools/tpu_queue_r4d.sh > /root/.pcc_queue/r4d.out 2>&1 &

QUEUE_NAME=r4d
cd /root/repo
source tools/queue_lib.sh

wait_tunnel || exit 1

step bench_256 3600 env PCC_TIMING=1 PCC_AOT_CACHE=/tmp/aotcache \
  BENCH_BATCH_BLOCKS=256 python -u bench.py

step bench_192 3600 env PCC_TIMING=1 PCC_AOT_CACHE=/tmp/aotcache \
  BENCH_BATCH_BLOCKS=192 python -u bench.py

# d2 sweep at 128 — feasible after a7eda1e removed the 16 GB padded
# normals-grid temp (per-block voxelize inside the map body)
step bench_d2_128 3600 env PCC_TIMING=1 BENCH_PIPELINE=2 \
  BENCH_NUM_CLOUDS=4 BENCH_BATCH_BLOCKS=128 \
  BENCH_OPT_METRICS=d1_mse,d2_mse PCC_AOT_CACHE=/tmp/aotcache \
  python -u bench.py

# c2's r4c eval (17:08) predates the d2-aware rd_eval; regenerate it
# from the committed assets so every ladder rung carries d2 columns,
# then rebuild the ladder
step eval_c2_d2 2400 env PCC_AOT_CACHE=/tmp/aotcache \
  python -u tools/rd_eval.py models/rd10k/c2 --config c2 --run_id c2 \
  --from-assets --fixed_threshold --seeds 200 201 202 \
  --out results/rd_c2_fixedthr.json \
  && step ladder_d2 600 python -u tools/rd_ladder.py

qlog "ALL DONE $(date -u)"
queue_status
