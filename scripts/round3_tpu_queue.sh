#!/bin/bash
# Round-3 TPU measurement queue — run once the axon tunnel is back.
# Each step is independently timeout-bounded; results append to the log.
set -u
cd /root/repo
LOG=${1:-/tmp/round3_queue.log}
echo "=== round3 queue start $(date) ===" >> "$LOG"

run() {
  echo "--- $* ---" >> "$LOG"
  timeout 1500 "$@" >> "$LOG" 2>&1
  echo "[rc=$?]" >> "$LOG"
}

# 1. corrected primitive rates (updates the design-decision table)
run python -u scripts/bench_primitives.py --reps 10

# 2. vw-van after the VMEM-resident flip (was 1.84 on the DMA ring)
run python -u scripts/bench_merged.py vw-van 32 32

# 3. vw-van packet-height A/B
env TB_PACKET_SUB=32 timeout 1500 python -u scripts/bench_merged.py vw-van 32 32 >> "$LOG" 2>&1

# 4. teapot k=128 density probe (k=64 was 6.63)
env TB_PACKET_SUB=32 timeout 1500 python -u scripts/bench_merged.py teapot 128 128 >> "$LOG" 2>&1

# 5. fidelity decomposition: vw-van rt_ldr vs alb_nrm at rising spp
run python -u scripts/bench_fidelity.py vw-van 8 16 32

# 6. cornell fidelity sanity with the new dual-model gate
run python -u scripts/bench_fidelity.py cornell 8

echo "=== round3 queue done $(date) ===" >> "$LOG"
