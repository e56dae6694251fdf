#!/bin/bash
# Round-4f TPU queue: follow-ups after r4e.
#
#   1. True d2-optimized bitstream rows for the UNIFORM-budget adaptive
#      rung (the c5 analogue): rd_eval --d2_group on the same
#      c3p-a0.75-10k checkpoints, so the ladder's d2 story doesn't rest
#      only on the flagship artifact. Rebuild ladder + data.csv.
#   2. Consolidated final bench with the batched native rANS coder
#      (one ctypes call per stream family, committed after r4c's
#      bench_final was queued) — the number of record for the round.
#   3. Warm the driver's default AOT cache.
#
# Launch:  setsid nohup bash tools/tpu_queue_r4f.sh > /root/.pcc_queue/r4f.out 2>&1 &

QUEUE_NAME=r4f
cd /root/repo
source tools/queue_lib.sh

wait_for_queue r4e
wait_tunnel || exit 1

step eval_trim_adaptive_d2g 7200 env PCC_AOT_CACHE=/tmp/aotcache \
  python -u tools/rd_eval.py --config c3p \
  --run_id c3p-a0.75-10k --from-assets --d2_group --seeds 200 201 202 \
  --out results/rd_c3p_a075_trim_adaptive.json \
  && step ladder_final 600 python -u tools/rd_ladder.py

step bench_batched_rans 2400 env PCC_TIMING=1 PCC_AOT_CACHE=/tmp/aotcache \
  python -u bench.py

step warm_default_cache3 120 bash -c \
  'mkdir -p /tmp/pcc_aot_cache && cp -n /tmp/aotcache/*.aotx /tmp/pcc_aot_cache/ || true'

qlog "ALL DONE $(date -u)"
queue_status
