"""Interleaved A/B of the grouped-sky window-select strategy on the TPU.

The grouped resolve fetches one 128-texel window per pixel group and then
selects each pixel's texel from it. "twostage" (shipped default since
round 3: one-hot over 4 rows then 32 columns) vs "onehot" (128-wide
compare+mask+sum) vs "binary" (7 halving wheres — measured 3x slower in
round 2: the serial stages break fusion). All exact; this measures which
lowers faster. Times eng.frame() (render-only, static grouped sky) under
compiled programs built with the flag flipped at trace time.

  python experiments/ab_sky_select.py [--b binary|onehot|twostage]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from raytracing_cuda_tpu.app.loop import Engine
from raytracing_cuda_tpu.scene import textures
from raytracing_cuda_tpu.utils.config import RenderConfig, enable_compilation_cache
from raytracing_cuda_tpu.utils.timing import device_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--a", default="twostage",
                    choices=["twostage", "onehot", "binary"])
    ap.add_argument("--b", default="onehot",
                    choices=["twostage", "onehot", "binary"])
    ap.add_argument("--reps", type=int, default=11)
    ap.add_argument("--n", type=int, default=14)
    args = ap.parse_args()

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))

    # SKY_SELECT is only read by the FLAT-layout pass; under the default
    # SKY_LAYOUT="auto" a real-size frame takes the gt layout (which
    # hardcodes the plain one-hot) and every arm traces the SAME program —
    # the A/B would time pure tunnel noise. Pin flat for the sweep.
    textures.SKY_LAYOUT = "flat"

    def build(select):
        textures.SKY_SELECT = select
        return Engine(RenderConfig(width=w, height=h,
                                   procedural_sky_shape=(2048, 4096)))

    print(f"compiling A ({args.a})...", flush=True)
    ea = build(args.a)
    ia = np.asarray(ea.frame())
    print(f"compiling B ({args.b})...", flush=True)
    eb = build(args.b)
    ib = np.asarray(eb.frame())
    textures.SKY_SELECT = "twostage"   # restore the shipped default
    assert np.array_equal(ia, ib), "select strategies must be exact-equal"

    def block(eng, n):
        t0 = time.perf_counter()
        img = None
        for _ in range(n):
            img = eng.frame()
        device_sync(img)
        return (time.perf_counter() - t0) / n * 1e3

    block(ea, 3)
    block(eb, 3)
    A, B = [], []
    for r in range(args.reps):
        A.append(block(ea, args.n))
        B.append(block(eb, args.n))
        print(f"rep {r}: A {A[-1]:.2f} ms   B {B[-1]:.2f} ms", flush=True)
    print(f"median A({args.a}) {statistics.median(A):.2f} ms   "
          f"B({args.b}) {statistics.median(B):.2f} ms")


if __name__ == "__main__":
    main()
