#!/usr/bin/env python
"""Long sustained soak: consecutive timed segments across the full clock.

Round-2 methodology (docs/PERFORMANCE.md "2000-frame soak"): segments of
sustained frames with the clock playing and the bench camera script, host
RSS sampled per segment. The per-segment fps spread is content-dependent
culling (open-sea views cull nearly everything; low-sun windows sweep the
mountain ring for near-horizontal shadow rays) — the minimum segment is
the floor the VERDICT tracks.

  python experiments/soak.py [--segments 5 --frames 400 --day0 12.0]
"""

from __future__ import annotations

import argparse
import os
import resource
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
    ap.add_argument("--segments", type=int, default=5)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--day0", type=float, default=12.0)
    ap.add_argument("--sky", default="auto")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.lower().split("x"))

    eng = Engine(RenderConfig(width=w, height=h, sky_source=args.sky))
    eng.set_state(sim.settle(sim.init_state()._replace(
        day_time=jnp.float32(args.day0))))

    fps = []
    done = 0
    for seg in range(args.segments):
        stats = eng.run(args.frames,
                        action_fn=lambda i: camera_path(done + i),
                        dt=1 / 60, warmup=2 if seg == 0 else 0)
        done += args.frames
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        fps.append(stats.fps)
        print(f"segment {seg}: {stats.fps:7.2f} fps  "
              f"clock={eng.time_string()}  rss={rss:.2f} GB", flush=True)
    print(f"floor {min(fps):.2f} fps   median {statistics.median(fps):.2f} "
          f"fps   peak {max(fps):.2f} fps over {done} frames")


if __name__ == "__main__":
    main()
