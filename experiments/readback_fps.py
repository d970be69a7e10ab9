"""Interactive-equivalent throughput: render + host readback per frame.

The sustained bench keeps frames on-device (the window blits from a host
copy, so the interactive loop pays device→host readback of a 720p RGB
frame every frame — ~2.8 MB over the remote tunnel). This measures the
serialized step+render+readback rate the pygame window would see, and the
pipelined variant where readback lags one frame behind the enqueue.

  python experiments/readback_fps.py --frames 120
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import camera_path as act              # the config-5 script itself
from raytracing_cuda_tpu.app.loop import Engine
from raytracing_cuda_tpu.utils.config import RenderConfig, enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--preview", type=int, default=1,
                    help="on-device box-downsample factor before readback "
                         "(the window's --preview mode; 1 = full frames)")
    args = ap.parse_args()

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))
    eng = Engine(RenderConfig(width=w, height=h, preview=args.preview,
                              procedural_sky_shape=(2048, 4096)))
    step = (eng.step_and_frame_preview if args.preview > 1
            else eng.step_and_frame)

    # warm
    for i in range(3):
        np.asarray(step(act(i)))

    def serialized():
        t0 = time.perf_counter()
        for i in range(args.frames):
            np.asarray(step(act(i)))   # sync every frame
        return args.frames / (time.perf_counter() - t0)

    def pipelined():
        t0 = time.perf_counter()
        prev = None
        for i in range(args.frames):
            img = step(act(i))
            if prev is not None:
                np.asarray(prev)     # read back frame i-1 while i renders
            prev = img
        np.asarray(prev)
        return args.frames / (time.perf_counter() - t0)

    def async_pipelined():
        """The window loop's actual discipline: copy_to_host_async right
        after enqueue, fetch one frame behind — hides the link round trip
        on top of the render overlap."""
        t0 = time.perf_counter()
        prev = None
        for i in range(args.frames):
            img = step(act(i))
            try:
                img.copy_to_host_async()
            except AttributeError:
                pass
            if prev is not None:
                np.asarray(prev)
            prev = img
        np.asarray(prev)
        return args.frames / (time.perf_counter() - t0)

    S, P, A = [], [], []
    for r in range(args.reps):
        S.append(serialized())
        P.append(pipelined())
        A.append(async_pipelined())
        print(f"rep {r}: serialized {S[-1]:.2f} fps   "
              f"pipelined {P[-1]:.2f} fps   async {A[-1]:.2f} fps",
              flush=True)
    print(f"median serialized {statistics.median(S):.2f} fps   "
          f"pipelined {statistics.median(P):.2f} fps   "
          f"async {statistics.median(A):.2f} fps")


if __name__ == "__main__":
    main()
