#!/bin/bash
# Post-refactor TPU bench block (run in a queue gap; single tunnel client!).
set -u
cd /root/repo
mkdir -p /tmp/qdone3

step() {
  local name=$1 tmo=$2; shift 2
  echo "[bench] ==> $name ($(date -u +%H:%M:%S))"
  timeout "$tmo" "$@" > "/tmp/q3_$name.log" 2>&1
  echo "[bench] <== $name rc=$? ($(date -u +%H:%M:%S))"
  tail -3 "/tmp/q3_$name.log" | sed 's/^/[bench]    /'
}

# 1. instrumented single cloud — event-gap check
step bench1 1800 env PCC_TIMING=2 BENCH_PIPELINE=1 BENCH_NUM_CLOUDS=1 \
  python -u bench.py
# 2. full 8-cloud bench, pipelined
step bench8 2400 env PCC_TIMING=1 BENCH_PIPELINE=2 python -u bench.py
# 3. slab-kernel Mosaic compile check (vmem_limit fix)
step slab 900 python -u tools/check_slab_tpu.py
# 4. pallas conv backend A/B on 2 clouds
step benchconv 1800 env BENCH_CONV_BACKEND=pallas BENCH_NUM_CLOUDS=2 \
  python -u bench.py
echo "[bench] block done $(date -u)"
