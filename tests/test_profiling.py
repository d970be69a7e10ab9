"""Profiling utility tests (SURVEY.md §5 tracing/metrics)."""

import time

from raytracing_cuda_tpu.utils.profiling import FrameProbe, trace
from raytracing_cuda_tpu.utils.timing import FrameStats


def test_frame_probe_stats():
    p = FrameProbe(window=16)
    assert p.stats() == {"frames": 0}
    for _ in range(5):
        p.tick()
        time.sleep(0.002)
    s = p.stats()
    assert s["frames"] == 4 and s["mean_ms"] >= 1.0
    assert s["p99_ms"] >= s["p50_ms"] > 0


def test_frame_probe_window_bound():
    p = FrameProbe(window=3)
    for _ in range(10):
        p.tick()
    assert p.stats()["frames"] == 3


def test_trace_degrades_gracefully(tmp_path):
    # CPU backend may or may not support the profiler; either way the
    # context must not raise
    with trace(str(tmp_path / "prof")):
        pass


def test_frame_stats_metrics():
    s = FrameStats(frames=60, seconds=1.0, width=1280, height=720)
    assert s.fps == 60.0
    assert abs(s.mrays_per_s - 55.296) < 1e-3   # the BASELINE north-star rate
    d = s.as_dict()
    assert d["frames"] == 60 and d["fps"] == 60.0
