# Shared runner for sequential TPU work queues (source, don't execute).
#
# Replaces the tpu_queue{1..8}.sh one-shots, which re-implemented the
# same wait-probe/step/marker pattern with drifting details (VERDICT r3
# weak #6). Fixes the advisor findings on that family:
#   - a step's done marker is written ONLY on rc==0, so a failed or
#     timed-out step re-runs on relaunch instead of being skipped
#     forever; `step` returns the real rc so queues can gate dependent
#     steps with && / `|| exit`.
#   - markers and logs live under a persistent root (default
#     /root/.pcc_queue), not /tmp, so a container reboot mid-run keeps
#     resume state and logs. (A full re-image still wipes them; results
#     that must survive anything are committed as assets.)
#
# Usage in a queue script:
#   QUEUE_NAME=r4
#   source "$(dirname "$0")/queue_lib.sh"
#   wait_tunnel || exit 1
#   step train_x 4800 python -u tools/... || exit 1   # gate dependents
#   step bench 2400 env FOO=1 python -u bench.py      # independent
#
# Relaunch the same script after an outage: completed (rc==0) steps
# skip, failed ones re-run. `queue_status` prints the ledger.

set -u
QUEUE_STATE_ROOT=${QUEUE_STATE_ROOT:-/root/.pcc_queue}
STATE_DIR="$QUEUE_STATE_ROOT/${QUEUE_NAME:?set QUEUE_NAME before sourcing}"
mkdir -p "$STATE_DIR"

qlog() { echo "[$QUEUE_NAME] $*"; }

wait_tunnel() {
  # Bounded data-path probe: device init alone is NOT evidence the
  # tunnel works — outages hang the first fetch with init OK.
  local tries=${1:-90}
  for i in $(seq 1 "$tries"); do
    qlog "tunnel probe $i $(date -u +%H:%M:%S)"
    if timeout 360 python -u - <<'PY' 2>/dev/null
import numpy as np, jax, jax.numpy as jnp
assert float(np.asarray(jnp.zeros(8) + 1.0).sum()) == 8.0
print("fetch ok")
PY
    then
      qlog "tunnel OK $(date -u)"
      return 0
    fi
    sleep 120
  done
  qlog "tunnel never recovered, giving up $(date -u)"
  return 1
}

step() {  # step <name> <timeout_s> <cmd...> -> real rc; marker on rc==0
  local name=$1 tmo=$2; shift 2
  local marker="$STATE_DIR/$name.ok"
  local log="$STATE_DIR/$name.log"
  if [ -f "$marker" ]; then
    qlog "$name already done, skipping"
    return 0
  fi
  qlog "==> $name ($(date -u +%H:%M:%S)) timeout ${tmo}s"
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  if [ "$rc" -eq 0 ]; then
    touch "$marker"
  else
    echo "$rc" > "$STATE_DIR/$name.failed"
  fi
  qlog "<== $name rc=$rc ($(date -u +%H:%M:%S))"
  tail -3 "$log" | sed "s/^/[$QUEUE_NAME]    /"
  return "$rc"
}

queue_status() {
  qlog "state in $STATE_DIR:"
  ls "$STATE_DIR" | sed "s/^/[$QUEUE_NAME]    /"
}

queue_alive() {  # queue_alive <name> — is that queue's bash process running?
  # Liveness CHECK only (no signals sent): a queue that is itself
  # blocked in wait_for_queue is silent with an empty state dir, so
  # file freshness alone misreads a waiting queue as dead (this fired
  # 2026-08-19: r4e declared r4d dead while r4d waited on r4c).
  pgrep -f "bash tools/tpu_queue_$1.sh" >/dev/null 2>&1
}

wait_for_queue() {  # wait_for_queue <name> — block until that queue's
  # ALL DONE marker appears in its .out, or the queue is truly dead:
  # no live process AND its .out + state dir silent for 45 min (the
  # silence window rides out relaunch gaps). Lets several queues be
  # staged at once on the single TPU.
  local out="$QUEUE_STATE_ROOT/$1.out" dir="$QUEUE_STATE_ROOT/$1"
  [ -f "$out" ] || return 0
  while true; do
    grep -q "ALL DONE" "$out" && { qlog "$1 finished $(date -u)"; return 0; }
    if ! queue_alive "$1"; then
      local newest
      newest=$(find "$out" "$dir" -type f -mmin -45 2>/dev/null | head -1)
      if [ -z "$newest" ]; then
        qlog "$1 process gone + silent 45 min, no ALL DONE; assuming dead $(date -u)"
        return 0
      fi
    fi
    sleep 60
  done
}
