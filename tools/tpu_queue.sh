#!/bin/bash
# Manifest-driven TPU work queue (replaces the per-round one-shot
# tpu_queue_r*.sh scripts — VERDICT r4 weak #7: plans should be data,
# not bash edited under a live process).
#
# Usage:
#   setsid nohup bash tools/tpu_queue.sh tools/queues/r5.tsv \
#     > /root/.pcc_queue/r5.out 2>&1 &
#
# Manifest format (tab-separated; '#' comments and blank lines skipped):
#   name <TAB> timeout_s <TAB> gate <TAB> command...
# gate:
#   req — failure ABORTS the rest of the queue
#   opt — failure logged, queue continues
#   seq — runs only if the PREVIOUS manifest step succeeded (dependent
#         chains, e.g. train -> eval -> export, start with a req/opt
#         head followed by seq rows; a skipped seq keeps the chain
#         broken so deeper rows skip too)
# Relaunching the same manifest skips rc==0 steps (queue_lib markers).

set -u
MANIFEST=${1:?usage: tpu_queue.sh <manifest.tsv>}
QUEUE_NAME=$(basename "$MANIFEST" | sed 's/\.[^.]*$//')
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

qlog "manifest $MANIFEST ($(grep -cv '^\s*\(#\|$\)' "$MANIFEST") steps)"
wait_tunnel || exit 1

last_failed=0
while IFS=$'\t' read -r name tmo gate cmd; do
  case "$name" in ''|'#'*) continue;; esac
  if [ "$gate" = "seq" ] && [ "$last_failed" = 1 ]; then
    qlog "SKIP $name (previous step failed)"
    continue  # last_failed stays 1: the whole chain skips
  fi
  if step "$name" "$tmo" bash -c "$cmd"; then
    last_failed=0
  else
    last_failed=1
    if [ "$gate" = "req" ]; then
      qlog "REQUIRED step $name failed; aborting queue"
      exit 1
    fi
    qlog "step $name failed (gate=$gate); continuing"
  fi
done < "$MANIFEST"

qlog "ALL DONE $(date -u)"
queue_status
