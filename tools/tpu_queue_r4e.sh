#!/bin/bash
# Round-4e TPU queue: re-run the flagship adaptive eval with
# --d2_group, so the flagship artifact carries TRUE d2-optimized
# bitstream rows (opt_group d2) next to the d1 group — the reference
# encodes both groups per cloud (compress_octree.py:109-118) and
# publishes data.csv's d2_psnr rows on the d2 group. Then rebuild the
# ladder + data.csv so those rows are published.
#
# Waits for tpu_queue_r4d.sh (which itself waits for r4c) — the queues
# share the single TPU.
#
# Launch:  setsid nohup bash tools/tpu_queue_r4e.sh > /root/.pcc_queue/r4e.out 2>&1 &

QUEUE_NAME=r4e
cd /root/repo
source tools/queue_lib.sh

wait_for_queue r4d
wait_tunnel || exit 1

step eval_flagship_d2g 7200 env PCC_AOT_CACHE=/tmp/aotcache \
  python -u tools/rd_eval.py models/rd/c3p-a0.75 --config c3p \
  --run_id c3p-a0.75 --d2_group --seeds 200 201 202 203 \
  --out results/rd_c3p_a075.json \
  && step ladder_d2g 600 python -u tools/rd_ladder.py

step warm_default_cache2 120 bash -c \
  'mkdir -p /tmp/pcc_aot_cache && cp -n /tmp/aotcache/*.aotx /tmp/pcc_aot_cache/ || true'

qlog "ALL DONE $(date -u)"
queue_status
