#!/usr/bin/env python
"""Why the grouped sky resolve's window is 4x32 texels and groups are 16.

The round-5 finding that the resolve's whole cost is the (h, w) <-> (G, NG)
boundary relayout (resolve_decompose + ab_sky_group, docs/PERFORMANCE.md)
suggested "flat128": 128-pixel groups = one lane tile, so the pixel field
enters by a FREE contiguous reshape, with the pack as x-phase-shifted
1x128-texel sky ROWS. Implemented and probed 2026-08-19; this script is the
measurement that killed it, kept runnable so the geometry is re-checkable
on different content or FOVs.

Per 128-pixel group (flattened (h, w) order) at 720p, init pose, day 9:

  sky 512x1024 : row-spread p50 1  p90 25   p99 53   max 191
                 distinct rows p50 2  p90 23
  sky 4096x8192: row-spread p50 3  p90 201  p99 422  max 1523
                 distinct rows p50 5  p90 99

A 1-row window covers one sky row per pass: the p90 group needs ~99 passes
at the reference sky. The spread is geometric — equirect rows compress
toward the poles, so near-vertical rays sweep huge iy ranges, and camera
pitch tilts screen rows across sky rows. End-to-end confirmation: at real
sizes the 4-pass flat128 resolve covered only 82-86% of pixels (vs 97-98%
for the shipped resolve) with rmse 0.014-0.018 against it — an order of
magnitude over the 2e-3 parity gates. The shipped design's 4-row window +
half-tile phase copies + 16-pixel groups is sized exactly for this
distribution (16-pixel spans keep both the x-extent within 32 texels AND
the y-extent within 4 rows for ~97-99% of groups at real sizes); removing
the boundary relayout needs an idea that keeps a 2-D window, not a wider
group.

  python experiments/sky_row_spread.py [--size 1280x720 --day 9.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_cuda_tpu.utils.config import apply_env_platform

apply_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.scene import textures as T
import raytracing_cuda_tpu.sim.state as sim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--day", type=float, default=9.0)
    ap.add_argument("--group", type=int, default=128)
    args = ap.parse_args()
    W, H = (int(v) for v in args.size.split("x"))

    st = sim.settle(sim.init_state()._replace(day_time=jnp.float32(args.day)))
    corners = np.asarray(sim.camera_rays(st.cam, W / H))  # LD RD LU RU
    fy = (np.arange(H) + 0.5) / H
    fx = (np.arange(W) + 0.5) / W
    down = corners[0] * (1 - fx[:, None]) + corners[1] * fx[:, None]
    up = corners[2] * (1 - fx[:, None]) + corners[3] * fx[:, None]
    d = up[None] * (1 - fy[:, None, None]) + down[None] * fy[:, None, None]
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    for SH, SW in ((512, 1024), (4096, 8192)):
        iy, _ = T._equirect_indices(SH, SW, jnp.asarray(d, jnp.float32),
                                    args.day / 24.0)
        iy = np.asarray(iy).reshape(-1, args.group)
        spread = iy.max(axis=1) - iy.min(axis=1)
        nrows = np.array([len(np.unique(r)) for r in iy[::37]])
        print(f"sky {SH}x{SW}: row-spread p50={np.percentile(spread, 50):.0f}"
              f" p90={np.percentile(spread, 90):.0f}"
              f" p99={np.percentile(spread, 99):.0f} max={spread.max()}"
              f"  distinct-rows p50={np.percentile(nrows, 50):.0f}"
              f" p90={np.percentile(nrows, 90):.0f}")


if __name__ == "__main__":
    main()
