#!/usr/bin/env python
"""Per-frame tail latency on the sustained loop, block-sync methodology.

Mirrors the docs/PERFORMANCE.md "Tail latency on this tunnel" measurement:
B blocks of K frames each with ONE device sync per block (Engine.run syncs
when it computes FrameStats), so every number carries ~28/K ms of sync
round-trip amortization — quote it alongside. Tails on this time-shared
tunnel are dominated by remote scheduling, not the kernel; rerun before
believing an outlier (CLAUDE.md measurement discipline).

  python experiments/tail_probe.py [--blocks 60 --frames 10 --size 1280x720]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import camera_path
from raytracing_cuda_tpu.app.loop import Engine
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import RenderConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--blocks", type=int, default=60)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--day0", type=float, default=12.0)
    ap.add_argument("--sky", default="auto")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.lower().split("x"))

    eng = Engine(RenderConfig(width=w, height=h, sky_source=args.sky))
    eng.set_state(sim.settle(sim.init_state()._replace(
        day_time=jnp.float32(args.day0))))
    eng.run(20, action_fn=camera_path, dt=1 / 60, warmup=2)  # compile + warm

    done = 20
    per_frame_ms = []
    for _ in range(args.blocks):
        t0 = time.perf_counter()
        eng.run(args.frames, action_fn=lambda i: camera_path(done + i),
                dt=1 / 60, warmup=0)
        per_frame_ms.append((time.perf_counter() - t0) / args.frames * 1e3)
        done += args.frames
    s = sorted(per_frame_ms)
    n = len(s)
    q = lambda p: s[min(n - 1, int(n * p))]
    print(f"{n} blocks x {args.frames} frames at {args.size} "
          f"(one sync per block, ~{28 / args.frames:.1f} ms/frame sync amortization):")
    print(f"p50 {q(0.50):.1f}  p90 {q(0.90):.1f}  p99 {q(0.99):.1f}  "
          f"mean {statistics.mean(s):.1f}  min {s[0]:.1f}  max {s[-1]:.1f} ms/frame")


if __name__ == "__main__":
    main()
