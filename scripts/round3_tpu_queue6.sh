#!/bin/bash
# Round-3 TPU queue #6 (after the 8192-spp golden regen):
#   1. fidelity probe v2 on the fresh golden (demod-filtered variants,
#      RR-off + clamp estimator config)
#   2. binned-cut A/B on the production merged waves with cut-size and
#      pair-budget sweeps (the emit kernel fix landed; queue5 faulted)
set -u
cd /root/repo
LOG=${1:-/tmp/round3_queue6.log}
echo "=== queue6 start $(date) ===" >> "$LOG"

run() {
  echo "--- $* ---" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "[rc=$?]" >> "$LOG"
}

run python -u scripts/probe_fidelity_combo2.py vw-van 8 16.0
run python -u scripts/probe_gate_api.py vw-van 8
run python -u scripts/probe_gate_api.py cornell 8

# Classic baselines (same harness, same day, same chip).
run python -u scripts/bench_merged.py teapot 32 32
run python -u scripts/bench_merged.py dragon 32 32

# Cut sweep: teapot (160k tris) and dragon (51k in checkout).
for CT in 512 2048 4096; do
  for K in 6 8; do
    run env TB_CUT=1 TB_CUT_TRIS=$CT TB_CUT_K=$K \
      python -u scripts/bench_merged.py teapot 32 32
  done
done
run env TB_CUT=1 TB_CUT_TRIS=512 TB_CUT_K=8 \
  python -u scripts/bench_merged.py dragon 32 32
run env TB_CUT=1 TB_CUT_TRIS=2048 TB_CUT_K=8 \
  python -u scripts/bench_merged.py dragon 32 32

echo "=== queue6 done $(date) ===" >> "$LOG"
