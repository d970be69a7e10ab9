#!/usr/bin/env python
"""Decompose WHERE the megakernel's time goes at a pose.

The worst-pose stage decomposition (worst_pose_decompose.py) splits the
frame into kernel / sky resolve / FXAA; this splits the KERNEL itself with
static ablation arms (render_base_planes_pallas(ablate=...)):

  full       the shipped kernel (ablate=())
  noshadow   occlusion sweeps removed (lights never blocked)
  noshade    shading/bounce epilogue removed (intersections only)
  depth0/1/2 bounce depth capped (depth0 = primaries only)
  nocull     interval culls disabled (every cluster sweeps)
  no_tbound  t-bound culls off (existing knob, for reference)

Interpretation guide: full − noshadow = total shadow-sweep cost across
all levels; full − depth1 ≈ reflection levels 2+; nocull − full = what
interval culling saves at this pose. noshade implies no bounces (the
epilogue also advances rays), so it measures ONE level; sweep_only
(noshade+noshadow) is the pure level-0 primary-sweep cost, and
noshade − sweep_only the level-0 shadow sweeps. Arms change the image
(diagnostic only) — every arm still renders all tiles' primaries, so the
numbers decompose the same pose, not different workloads.

Same discipline as every harness here: identical pipelined programs,
interleaved reps, per-arm medians.

  python experiments/megakernel_ablation.py [--day 17.6 --yaw 315]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_cuda_tpu.utils.config import apply_env_platform

apply_env_platform()   # honor an explicit JAX_PLATFORMS (CPU smokes)

import jax

from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                ISLAND_TRI_CLUSTERS,
                                                ISLAND_TRI_SUBS, build_scene)
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import enable_compilation_cache
from raytracing_cuda_tpu.utils.timing import device_sync

ARMS = (
    ("full", dict()),
    ("noshadow", dict(ablate=("noshadow",))),
    ("noshade", dict(ablate=("noshade",))),
    ("sweep_only", dict(ablate=("noshade", "noshadow"))),
    ("depth0", dict(ablate=("depth0",))),
    ("depth1", dict(ablate=("depth1",))),
    ("depth2", dict(ablate=("depth2",))),
    ("nocull", dict(ablate=("nocull",))),
    ("no_tbound", dict(t_bound=False)),
    # below-horizon light cull (output-identical, pinned by
    # test_hcull_bit_identical): shipped ON since the 2026-08-18 A/B
    # (worst pose 10.15 → 8.56 ms, day 10.14 → 8.42 — docs/PERFORMANCE.md).
    # "nohcull" measures its value at any pose; "hcull" forces it on for
    # A/Bs run while the default is off.
    ("hcull", dict(ablate=("hcull",))),
    ("nohcull", dict(ablate=("nohcull",))),
    # per-light specular gate (output-identical, pinned by
    # test_specgate_bit_identical): sibling-cond hoist of the Phong-spec
    # chain, skipped on no-shine tiles and tile-wide plane-killed lights.
    # "specgate" forces it on for A/Bs while SPECGATE_DEFAULT is off;
    # "nospecgate" measures its value once the default flips.
    ("specgate", dict(ablate=("specgate",))),
    ("nospecgate", dict(ablate=("nospecgate",))),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--day", type=float, default=17.6)
    ap.add_argument("--yaw", type=float, default=315.0)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke (tiny size recommended)")
    ap.add_argument("--arms", default=None,
                    help="comma list to run a focused subset (e.g. "
                         "'full,hcull' for the hcull A/B); default: all")
    args = ap.parse_args()
    arms = ARMS if args.arms is None else tuple(
        a for a in ARMS if a[0] in set(args.arms.split(",")))
    if args.arms is not None and len(arms) != len(set(args.arms.split(","))):
        sys.exit(f"unknown arm in --arms {args.arms}")

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))
    scene = jax.device_put(build_scene())

    from bench import preset_state   # ONE pose builder for every harness

    st = preset_state(day=args.day, yaw=args.yaw)
    scene_f, lights, ambient = jax.jit(sim.derive_frame)(scene, st)
    rays = jax.jit(sim.camera_rays, static_argnums=1)(st.cam, w / h)
    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, t_subs=ISLAND_TRI_SUBS,
              interpret=args.interpret)

    fns = {name: jax.jit(lambda extra=extra: render_base_planes_pallas(
        scene_f, lights, ambient, rays, h, w, **kw, **extra)[0])
        for name, extra in arms}

    def block(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        device_sync(out)
        return (time.perf_counter() - t0) / n * 1e3

    for name, fn in fns.items():
        device_sync(fn())              # compile
        print(f"compiled {name}", file=sys.stderr)
    meds = {}
    for r in range(args.reps):
        for name, fn in fns.items():   # interleaved: arm order within rep
            meds.setdefault(name, []).append(block(fn, args.n))
    ref_name = "full" if "full" in meds else next(iter(meds))
    full = statistics.median(meds[ref_name])
    for name, v in meds.items():
        m = statistics.median(v)
        print(f"{name}: {m:.2f} ms (delta vs {ref_name} {m - full:+.2f}) "
              f"[{', '.join('%.1f' % x for x in v)}]")


if __name__ == "__main__":
    main()
