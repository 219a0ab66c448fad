#!/usr/bin/env bash
# Sequential benchmark sweep over the round-2 pending configs.
# Each run appends to bench_history.jsonl; logs to /tmp/bench_sweep.log.
# Usage: setsid nohup scripts/bench_sweep.sh > /tmp/bench_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date -u +%H:%M:%S) $* ==="
  env "$@" python bench.py
  echo "=== rc=$? ==="
}

# 1. default + int8 self-KV
run BENCH_BATCH=24 BENCH_KV=8 BENCH_SELF_KV=8
# 2. B=32 cross+self int8
run BENCH_BATCH=32 BENCH_KV=8 BENCH_SELF_KV=8
# 3. 4-bit fused-QKV quant path at B=8 (r1 comparison point: 75.7 vs bf16 95.8)
run BENCH_BATCH=8 BENCH_QUANT=4 BENCH_KV=8 BENCH_FUSE_QKV=1
# 4. 4-bit + int8 cross+self KV at the default batch
run BENCH_BATCH=24 BENCH_QUANT=4 BENCH_KV=8 BENCH_SELF_KV=8 BENCH_FUSE_QKV=1
