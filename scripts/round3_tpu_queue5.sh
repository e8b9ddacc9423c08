#!/bin/bash
# Round-3 TPU queue #5: the binned-subtree (TB_CUT=1) backend A/B on
# the production merged waves, then an end-to-end CLI render on the cut
# path, then the 8192-spp vw-van golden regen.
set -u
cd /root/repo
LOG=${1:-/tmp/round3_queue5.log}
echo "=== queue5 start $(date) ===" >> "$LOG"

run() {
  echo "--- $* ---" >> "$LOG"
  timeout 2000 "$@" >> "$LOG" 2>&1
  echo "[rc=$?]" >> "$LOG"
}

TB_CUT=1 run python -u scripts/bench_merged.py dragon 32 32
TB_CUT=1 run python -u scripts/bench_merged.py teapot 32 32
TB_CUT=1 run python -u scripts/bench_merged.py vw-van 32 32
TB_CUT=1 run python -m tracerboy_tpu.app.cli \
    /root/reference/Scenes/Teapot/scene.pbrt --spp 4 --size 256x160 \
    --out /tmp/cut_teapot.png
run python -m tracerboy_tpu.app.cli \
    /root/reference/Scenes/Teapot/scene.pbrt --spp 4 --size 256x160 \
    --out /tmp/classic_teapot.png

echo "=== queue5 done $(date) ===" >> "$LOG"
