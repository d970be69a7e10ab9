#!/bin/bash
# TPU tunnel recovery watcher (VERDICT r4 items #1 + #7).
#
# The remote axon tunnel wedges for hours at a time (CLAUDE.md; BENCH_r03
# and BENCH_r04 were both lost to it). Waiting to *notice* recovery by hand
# wastes the recovery window — this watcher probes the backend in a BOUNDED
# subprocess every WATCH_INTERVAL_S seconds and, on the first healthy probe,
# fires the measurement session (default: experiments/round5_tpu_session.sh)
# exactly once, then exits.
#
# The watcher can never wedge itself: every probe runs under `timeout`, so a
# hung axon client creation (the wedge signature) is killed at
# PROBE_TIMEOUT_S and logged as a FAIL. All probe outcomes append to the
# outage ledger (logs/tpu_watch.log).
#
# Wedge drill (VERDICT #7 — verify the watcher survives a simulated wedge):
#   WATCH_PROBE_CMD='sleep 999' PROBE_TIMEOUT_S=2 WATCH_INTERVAL_S=1 \
#     WATCH_MAX_PROBES=3 bash experiments/tpu_watcher.sh
# must exit 1 after 3 FAIL ledger lines, a few seconds total. Recovery
# drill: WATCH_PROBE_CMD='echo WATCH-PROBE-OK' WATCH_SESSION=/bin/true.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
LEDGER="${WATCH_LEDGER:-logs/tpu_watch.log}"
SESSION="${WATCH_SESSION:-experiments/round5_tpu_session.sh}"
INTERVAL="${WATCH_INTERVAL_S:-600}"
PROBE_T="${PROBE_TIMEOUT_S:-120}"
MAX_PROBES="${WATCH_MAX_PROBES:-0}"   # 0 = probe until recovery

# background shells MUST keep the axon sitecustomize on PYTHONPATH or the
# probe silently loses the remote backend (CLAUDE.md environment facts)
case ":${PYTHONPATH:-}:" in
  *:/root/.axon_site:*) ;;
  *) export PYTHONPATH="/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}" ;;
esac

probe() {
  if [ -n "${WATCH_PROBE_CMD:-}" ]; then
    timeout "$PROBE_T" bash -c "$WATCH_PROBE_CMD"
  else
    # platform != cpu guards against a misconfigured CPU fallback counting
    # as "tunnel back" and burning the one-shot session on a smoke backend
    timeout "$PROBE_T" python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
print('WATCH-PROBE-OK', len(d), d[0].platform)
"
  fi
}

n=0
while :; do
  n=$((n + 1))
  ts="$(date -u +%Y-%m-%dT%H:%M:%SZ)"
  out="$(probe 2>&1)"
  if grep -q "WATCH-PROBE-OK" <<<"$out"; then
    echo "$ts probe $n OK: $(tail -c 120 <<<"$out" | tr '\n' ' ')" >> "$LEDGER"
    echo "$ts launching session: $SESSION" >> "$LEDGER"
    bash "$SESSION"
    rc=$?
    echo "$(date -u +%Y-%m-%dT%H:%M:%SZ) session rc=$rc" >> "$LEDGER"
    exit "$rc"
  fi
  echo "$ts probe $n FAIL: $(tail -c 160 <<<"$out" | tr '\n' ' ')" >> "$LEDGER"
  if [ "$MAX_PROBES" -gt 0 ] && [ "$n" -ge "$MAX_PROBES" ]; then
    echo "$ts giving up after $n probes (WATCH_MAX_PROBES)" >> "$LEDGER"
    exit 1
  fi
  sleep "$INTERVAL"
done
