#!/bin/bash
# Round-3 TPU queue #3: untangle the merged-wave regression (env-NEE
# vs chunked gather), measure the union tax, quantify golden noise,
# and run the fidelity-variant shootout.
set -u
cd /root/repo
LOG=${1:-/tmp/round3_queue3.log}
echo "=== queue3 start $(date) ===" >> "$LOG"

run() {
  echo "--- $* ---" >> "$LOG"
  timeout 1500 env "${ENVV[@]:-TB_NOOP=0}" "$@" >> "$LOG" 2>&1
  echo "[rc=$?]" >> "$LOG"
}

ENVV=(TB_ENV_NEE=0) run python -u scripts/bench_merged.py dragon 32 32
ENVV=(TB_ENV_NEE=0) run python -u scripts/bench_merged.py teapot 64 64
ENVV=(TB_NOOP=0)    run python -u scripts/bench_merged.py dragon 32 32
run python -u scripts/bench_traverse.py --scene teapot --stats \
    --sets bounce,primary --variants v2 --runs 8
run python -u scripts/probe_golden_noise.py vw-van 256
run python -u scripts/probe_fidelity_combo.py vw-van 8

echo "=== queue3 done $(date) ===" >> "$LOG"
