#!/bin/bash
# Round-4 TPU measurement sequence (VERDICT r3 items 1-4), to run on first
# tunnel recovery. Each step is independently resumable; everything logs to
# logs/round4_tpu_<ts>.log. Order matters: the full bench first re-warms
# the compile cache for every round-3 shape AND captures the headline
# numbers; the tunes recompile candidate shapes afterwards so a mid-session
# wedge can't leave the flagship cache cold.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs
LOG="logs/round4_tpu_$(date +%Y%m%d_%H%M%S).log"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${STEP_TIMEOUT:-5400}" "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? ===" | tee -a "$LOG"
}

# 1. warm cache + headline capture (VERDICT #1)
run python bench.py
# 2. megakernel cost decomposition at the pinned worst pose (VERDICT #2)
run python experiments/megakernel_ablation.py --day 17.6 --yaw 315
# 3. sky-resolve knob recalibration -> autotune.json "sky" (VERDICT #3)
run python bench.py --tune-sky
# 4. per-size launch-knob retune (VERDICT #4): flagship last so the
#    top-level entry ends on the 720p winner with a warm cache
run python bench.py --tune --size 1920x1080,640x480,1280x720
# 5. fresh non-720p numbers on the round-3 kernel (VERDICT #4)
run python bench.py --size 1920x1080 --frames 120
echo "session complete; log: $LOG"
