"""Interleaved A/B of Engine.run batch sizes on the TPU.

The sustained 720p loop can dispatch one fused step per frame (batch=1,
pipelined enqueues) or one lax.scan of N fused steps per dispatch
(batch=N, amortizes the tunnel's per-dispatch quantum but pays the scan
carry). Two separate bench sessions showed batch=1 slightly ahead; this
measures it properly (alternating blocks of the same compiled programs,
docs/PERFORMANCE.md discipline).

  python experiments/ab_batch.py --batch-a 1 --batch-b 16
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import camera_path                     # the config-5 script itself
from raytracing_cuda_tpu.app.loop import Engine
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import RenderConfig, enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-a", type=int, default=1)
    ap.add_argument("--batch-b", type=int, default=16)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--sky", default="auto")
    args = ap.parse_args()

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))
    eng = Engine(RenderConfig(width=w, height=h, sky_source=args.sky,
                              procedural_sky_shape=(2048, 4096)))

    def block(batch):
        eng.set_state(sim.settle(sim.init_state()))
        t0 = time.perf_counter()
        stats = eng.run(args.frames, action_fn=camera_path, dt=1 / 60,
                        batch=batch)
        dt = time.perf_counter() - t0
        return stats.fps, dt

    print(f"A: batch={args.batch_a}   B: batch={args.batch_b}")
    block(args.batch_a)   # warm both programs
    block(args.batch_b)
    A, B = [], []
    for r in range(args.reps):
        A.append(block(args.batch_a)[0])
        B.append(block(args.batch_b)[0])
        print(f"rep {r}: A {A[-1]:.2f} fps   B {B[-1]:.2f} fps", flush=True)
    print(f"median A {statistics.median(A):.2f} fps   "
          f"B {statistics.median(B):.2f} fps")


if __name__ == "__main__":
    main()
