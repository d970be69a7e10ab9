#!/usr/bin/env python
"""Isolate the per-frame cost of CHANGING sky weights inside a crossfade.

The reference blends the four panoramas per ray every frame
(kernel.cu:156-163) — its cost is flat across the 24 h clock. This
harness measures what the engine pays when sky_vars drift frame-to-frame:
interleaved A/B of the SAME state window with the clock playing vs frozen
— content is identical up to ±0.08 h of light drift inside a 10-frame
block, so the delta is the weight-change cost. Against the round-2
cached pre-blend it measured the +15.7 ms full-panorama re-pack that
motivated the static sky stack; against the shipped stack both arms run
the same two-gather fade resolve and the delta is ~0 (+0.29 ms measured
— docs/PERFORMANCE.md).

Run on the TPU:
  python experiments/ab_crossfade.py [--sky reference] [--day 9.0]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sky", default="reference",
                    choices=["reference", "procedural"])
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--days", default="9.0,14.0",
                    help="comma list: crossfade state(s) + pure-band control")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n", type=int, default=10, help="frames per timed block")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.lower().split("x"))

    from raytracing_cuda_tpu.app.loop import Engine
    from raytracing_cuda_tpu.sim import state as sim
    from raytracing_cuda_tpu.utils.config import RenderConfig
    from raytracing_cuda_tpu.utils.timing import device_sync

    eng = Engine(RenderConfig(width=w, height=h, sky_source=args.sky))
    print(f"sky={args.sky} texels={eng.sky_texels.shape} size={w}x{h}",
          flush=True)

    def make_state(day, play):
        st = sim.settle(sim.init_state()._replace(day_time=jnp.float32(day)))
        return st._replace(play=jnp.bool_(play))

    def block(day, play, n):
        """One timed block: reset state, n fused step+render frames, end
        sync. play=True advances the clock (sky_vars drift inside a fade →
        re-blend each frame); play=False freezes it (cache hits)."""
        eng.set_state(make_state(day, play))
        # settle the cache for this state (first frame always blends)
        device_sync(eng.step_and_frame())
        eng.set_state(make_state(day, play))
        t0 = time.perf_counter()
        img = None
        for _ in range(n):
            img = eng.step_and_frame()
        device_sync(img)
        return (time.perf_counter() - t0) / n

    for day in (float(d) for d in args.days.split(",")):
        block(day, True, 2)
        block(day, False, 2)   # warm both branches
        a, b = [], []
        for _ in range(args.reps):
            a.append(block(day, True, args.n) * 1e3)
            b.append(block(day, False, args.n) * 1e3)
        ma, mb = statistics.median(a), statistics.median(b)
        print(f"day={day:5.1f}  play(weights drift)={ma:7.2f} ms  "
              f"frozen={mb:7.2f} ms  delta={ma - mb:+7.2f} ms  "
              f"[a={['%.1f' % v for v in a]} b={['%.1f' % v for v in b]}]",
              flush=True)


if __name__ == "__main__":
    main()
