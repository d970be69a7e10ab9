#!/bin/bash
# Round-5 TPU measurement session (VERDICT r4 "Next round" items 1-6), run
# on first tunnel recovery — normally fired by experiments/tpu_watcher.sh.
# Each step is independently resumable; everything logs to
# logs/round5_tpu_<ts>.log. Ordering:
#   * the full bench FIRST — re-warms the compile cache for every flagship
#     shape and captures the headline numbers before anything riskier runs;
#   * the ablation + tunes in the middle (they compile candidate shapes);
#   * a FINAL full bench so the committed tree ends compute-warm under
#     whatever knobs the tunes selected (a mid-session wedge can truncate
#     the tail, never the already-captured headline).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs
LOG="logs/round5_tpu_$(date +%Y%m%d_%H%M%S).log"

# Hold the session lock so a concurrently-fired driver bench waits instead
# of contending on the shared TPU (bench.wait_for_session_lock). A
# background toucher keeps the lock's mtime fresh every 5 min so the 2 h
# staleness guard holds no matter how long a step runs (per-step touches
# alone would break the contract if STEP_TIMEOUT were raised past it).
# Our OWN bench steps must ignore the lock or they'd deadlock on it.
LOCK="logs/tpu_session.lock"
export BENCH_IGNORE_SESSION_LOCK=1

# A driver bench that won the recovery race claims the same lock while it
# measures (bench.py removes it at exit, but never touches it afterward) —
# wait for a FOREIGN fresh lock before claiming ours: ≥45 min without a
# touch means the holder is dead (only our own toucher refreshes at 5-min
# cadence; a live bench run is minutes), and 3 h bounds the total wait.
WAIT0=$(date +%s)
while [ -f "$LOCK" ]; do
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOCK" 2>/dev/null || echo 0) ))
  [ "$AGE" -ge 2700 ] && break
  [ $(( $(date +%s) - WAIT0 )) -ge 10800 ] && break
  echo "waiting for foreign $LOCK (age ${AGE}s)"; sleep 60
done

touch "$LOCK"
( while :; do sleep 300; touch "$LOCK"; done ) &
TOUCHER=$!
trap 'kill "$TOUCHER" 2>/dev/null; rm -f "$LOCK"' EXIT

# every step's rc is logged AND folded into WORST, which becomes the
# session's exit code — the watcher ledgers it, so "session rc=0" really
# means every step (including the record keeps-pace gate) passed
WORST=0
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${STEP_TIMEOUT:-5400}" "$@" 2>&1 | tee -a "$LOG"
  local rc=$?
  echo "=== rc=$rc ===" | tee -a "$LOG"
  [ "$rc" -gt "$WORST" ] && WORST=$rc
  touch "$LOCK"
}

# 1. warm cache + headline capture (VERDICT #1)
run python bench.py
# 2. megakernel cost decomposition at the pinned worst pose (VERDICT #2)
run python experiments/megakernel_ablation.py --day 17.6 --yaw 315
# 3. sky-resolve knob recalibration -> autotune.json "sky" (VERDICT #3)
run python bench.py --tune-sky
# 4. per-size launch-knob retune (VERDICT #3/#4): flagship last so the
#    top-level entry ends on the 720p winner with a warm cache. Trimmed
#    sweep (5 TH x 2 TW instead of 7x3): ~30 cold candidate compiles
#    across three sizes is already hours through the remote AOT toolchain
#    — the dropped extremes (TH 8/64, TW 512) lost every prior sweep, and
#    the kept set brackets the committed winner (48,128) plus the
#    1080-divisible 24/40 rows. Step timeout raised to match.
STEP_TIMEOUT=10800 run python bench.py --tune \
    --size 1920x1080,640x480,1280x720 \
    --tune-th 16,24,32,40,48 --tune-tw 128,256
# 5. fresh non-720p numbers on the current kernel (VERDICT #4); bench
#    auto-generates the CPU-oracle goldens for this size if missing and
#    gates compiled-TPU parity against them (VERDICT #5)
run python bench.py --size 1920x1080 --frames 120
# 6. offline quality modes, measured once (VERDICT #6): SSAA 2x at 720p
#    (renders 2560x1440) through the zlib writer; `record` exits non-zero
#    if the writer dropped frames, so rc!=0 here = keeps-pace FAILED
run bash -c 'time python -m raytracing_cuda_tpu record /tmp/r5_ssaa \
    --ssaa 2 --png-level 6 --frames 60'
run bash -c 'ls /tmp/r5_ssaa | wc -l; du -sh /tmp/r5_ssaa'
# 7. final full bench: leaves the compile cache warm under the POST-tune
#    knobs so the driver's BENCH_r05 run is warm no matter what the tunes
#    changed (a knob flip invalidates the step-1 warm)
run python bench.py
echo "session complete (worst step rc=$WORST); log: $LOG"
exit "$WORST"
