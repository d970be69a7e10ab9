#!/usr/bin/env python
"""Probe frame cost across (day, camera yaw) to find the true worst state.

day_time and the camera ride the traced state, so every probe reuses ONE
compiled program — a 2-D sweep costs seconds. The soak's 60 fps windows
were attributed to low-sun shadow sweeps; this locates the exact pose so
the bench worst-case config pins something real.

  python experiments/worst_state_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from raytracing_cuda_tpu.app.loop import Engine
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import RenderConfig
from raytracing_cuda_tpu.utils.timing import device_sync


def main():
    eng = Engine(RenderConfig(width=1280, height=720))
    base = sim.init_state()

    def ms(day, yaw, pitch=-7.07, n=8):
        st = sim.settle(base._replace(
            day_time=jnp.float32(day),
            cam=base.cam._replace(hor_angle=jnp.float32(yaw),
                                  ver_angle=jnp.float32(pitch)),
            play=jnp.bool_(False)))
        eng.set_state(st)
        device_sync(eng.frame())
        t0 = time.perf_counter()
        img = None
        for _ in range(n):
            img = eng.frame()
        device_sync(img)
        return (time.perf_counter() - t0) / n * 1e3

    ms(14.0, 309.0)   # warm
    worst = (0.0, None)
    for day in (6.5, 12.0, 14.0, 17.0, 17.6, 18.0, 19.0, 1.0):
        row = []
        for yaw in range(0, 360, 45):
            v = ms(day, float(yaw))
            row.append(f"{yaw:3d}°={v:5.1f}")
            if v > worst[0]:
                worst = (v, (day, yaw))
        print(f"day {day:4.1f}: " + "  ".join(row), flush=True)
    print(f"worst: {worst[0]:.1f} ms at day={worst[1][0]} yaw={worst[1][1]}")


if __name__ == "__main__":
    main()
