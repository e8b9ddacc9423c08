#!/bin/bash
# Round-3 TPU queue #4: corrected env prefixes (queue3's array trick
# silently dropped TB_ENV_NEE) — env-NEE cost + packet-height A/Bs.
set -u
cd /root/repo
LOG=${1:-/tmp/round3_queue4.log}
echo "=== queue4 start $(date) ===" >> "$LOG"

run() {
  echo "--- $* ---" >> "$LOG"
  timeout 1500 "$@" >> "$LOG" 2>&1
  echo "[rc=$?]" >> "$LOG"
}

TB_ENV_NEE=0 run python -u scripts/bench_merged.py dragon 32 32
TB_PACKET_SUB=32 run python -u scripts/bench_merged.py dragon 32 32
TB_PACKET_SUB=32 run python -u scripts/bench_merged.py teapot 64 64
TB_PACKET_SUB=32 run python -u scripts/bench_merged.py vw-van 64 64

echo "=== queue4 done $(date) ===" >> "$LOG"
