#!/bin/bash
# Round-3 TPU queue #2: merged-wave k sweeps after the chunked-gather
# OOM fix (teapot k=128 previously OOMed on the (N,19) attr gather pad).
set -u
cd /root/repo
LOG=${1:-/tmp/round3_queue2.log}
echo "=== queue2 start $(date) ===" >> "$LOG"

run() {
  echo "--- $* ---" >> "$LOG"
  timeout 1500 "$@" >> "$LOG" 2>&1
  echo "[rc=$?]" >> "$LOG"
}

run python -u scripts/bench_merged.py teapot 128 64
run python -u scripts/bench_merged.py dragon 128 32
run python -u scripts/bench_merged.py vw-van 64 64

echo "=== queue2 done $(date) ===" >> "$LOG"
