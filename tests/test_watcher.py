"""Drills for the TPU tunnel recovery watcher (VERDICT r4 #7).

The watcher must never wedge itself: probes run in `timeout`-bounded
subprocesses, so a hung axon client (the wedge signature) is killed and
logged. These drills exercise both arms with stubbed probes — no backend,
no network, seconds of runtime.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHER = os.path.join(REPO, "experiments", "tpu_watcher.sh")


def _run(env_extra, timeout=60):
    env = dict(os.environ, **env_extra)
    return subprocess.run(["bash", WATCHER], env=env, timeout=timeout,
                          capture_output=True, text=True)


def test_watcher_survives_simulated_wedge(tmp_path):
    """A probe that hangs forever (sleep 999 = the wedged-client signature)
    must be killed at PROBE_TIMEOUT_S, logged as FAIL, and the watcher must
    give up cleanly at WATCH_MAX_PROBES — never hang."""
    ledger = tmp_path / "ledger.log"
    r = _run({"WATCH_LEDGER": str(ledger), "WATCH_PROBE_CMD": "sleep 999",
              "PROBE_TIMEOUT_S": "1", "WATCH_INTERVAL_S": "0",
              "WATCH_MAX_PROBES": "3"})
    assert r.returncode == 1
    lines = ledger.read_text().splitlines()
    assert sum("FAIL" in ln for ln in lines) == 3
    assert any("giving up after 3 probes" in ln for ln in lines)


def test_watcher_fires_session_once_on_recovery(tmp_path):
    """First healthy probe launches the session exactly once, logs its rc,
    and the watcher exits with that rc."""
    ledger = tmp_path / "ledger.log"
    marker = tmp_path / "ran"
    session = tmp_path / "session.sh"
    session.write_text(f"echo once >> {marker}\nexit 0\n")
    r = _run({"WATCH_LEDGER": str(ledger), "WATCH_SESSION": str(session),
              "WATCH_PROBE_CMD": "echo WATCH-PROBE-OK",
              "WATCH_INTERVAL_S": "0"})
    assert r.returncode == 0
    assert marker.read_text() == "once\n"
    lines = ledger.read_text().splitlines()
    assert any("probe 1 OK" in ln for ln in lines)
    assert any("session rc=0" in ln for ln in lines)


def test_watcher_propagates_session_failure(tmp_path):
    """A failing session's rc surfaces as the watcher's exit code (so a
    supervising shell can tell capture-failed from never-recovered)."""
    ledger = tmp_path / "ledger.log"
    session = tmp_path / "session.sh"
    session.write_text("exit 7\n")
    r = _run({"WATCH_LEDGER": str(ledger), "WATCH_SESSION": str(session),
              "WATCH_PROBE_CMD": "echo WATCH-PROBE-OK",
              "WATCH_INTERVAL_S": "0"})
    assert r.returncode == 7
    assert any("session rc=7" in ln
               for ln in ledger.read_text().splitlines())
