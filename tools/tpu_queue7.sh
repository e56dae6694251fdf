#!/bin/bash
# Round-3 TPU work queue, revision 7: ladder repair.
# Waits for tpu_queue6.sh, then:
#   1. controlled c5-analogue: adaptive-threshold eval on the SAME
#      trimmed c3p-a0.75 checkpoints as the fixed-thr rung (the 30k
#      flagship's protocol differs, so its delta was contaminated)
#   2. extend the c1 rung (+6k steps/λ): 4k+1.5k leaves the V1 model's
#      factorized prior untrained (curve at 5-10 bpp, one -inf point)
#   3. re-eval c1, rebuild the ladder
#
# Resumable via /tmp/qdone7 markers; launch:
#   setsid nohup bash tools/tpu_queue7.sh > /tmp/tpu_queue7.log 2>&1 &

set -u
cd /root/repo
mkdir -p /tmp/qdone7

echo "[queue7] waiting for queue6 ($(date -u +%H:%M:%S))"
while ! grep -q "ALL DONE" /tmp/tpu_queue6.log 2>/dev/null; do
  sleep 30
done
echo "[queue7] queue6 done, starting ($(date -u +%H:%M:%S))"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "/tmp/qdone7/$name" ]; then
    echo "[queue7] $name already done, skipping"; return 0
  fi
  echo "[queue7] ==> $name ($(date -u +%H:%M:%S)) timeout ${tmo}s"
  timeout "$tmo" "$@" > "/tmp/q7_$name.log" 2>&1
  local rc=$?
  echo "$rc" > "/tmp/qdone7/$name"
  echo "[queue7] <== $name rc=$rc ($(date -u +%H:%M:%S))"
  tail -3 "/tmp/q7_$name.log" | sed 's/^/[queue7]    /'
  return 0
}

step adaptive_trim 2400 env PCC_AOT_CACHE=/tmp/aotcache python -u tools/rd_eval.py models/rd/c3p-a0.75 \
  --config c3p --run_id c3p-a0.75 \
  --out results/rd_c3p_a075_trim_adaptive.json --seeds 200 201 202
step ladder3 600 python -u tools/rd_ladder.py

step extend_c1 5400 env PCC_AOT_CACHE=/tmp/aotcache python -u tools/rd_train_all.py --config c1 \
  --extend 6000 --lambdas 2e-4 5e-5 1e-5
step eval_c1b 2400 env PCC_AOT_CACHE=/tmp/aotcache python -u tools/rd_eval.py --config c1 \
  --fixed_threshold --seeds 200 201 202
step ladder4 600 python -u tools/rd_ladder.py

echo "[queue7] ALL DONE $(date -u)"
