#!/usr/bin/env python
"""Decompose the worst-pose frame: kernel vs sky resolve vs FXAA.

The (day x yaw) probe showed engine frames at yaw 315 cost ~7 ms more
than the kernel-only A/B at the same state — this times the pipeline
stages separately (same compiled-program discipline, pipelined blocks).

  python experiments/worst_pose_decompose.py [--day 17.6 --yaw 315]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracing_cuda_tpu.render.fxaa import apply_fxaa_pallas
from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
from raytracing_cuda_tpu.render.pipeline import _pallas_base
from raytracing_cuda_tpu.render.reference import quantize
from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                ISLAND_TRI_CLUSTERS,
                                                ISLAND_TRI_SUBS, build_scene)
from raytracing_cuda_tpu.scene.textures import load_skies, sky_static_init
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import enable_compilation_cache
from raytracing_cuda_tpu.utils.timing import device_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--day", type=float, default=17.6)
    ap.add_argument("--yaw", type=float, default=315.0)
    ap.add_argument("--sky", default="reference")
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))
    scene = jax.device_put(build_scene())
    texels = jax.device_put(jnp.asarray(load_skies(args.sky).texels))
    sh, sw = texels.shape[1], texels.shape[2]
    stack = jax.jit(sky_static_init)(texels)

    from bench import preset_state   # ONE pose builder for every harness

    st = preset_state(day=args.day, yaw=args.yaw)
    scene_f, lights, ambient = jax.jit(sim.derive_frame)(scene, st)
    rays = jax.jit(sim.camera_rays, static_argnums=1)(st.cam, w / h)
    day_frac = float(st.day_time) / 24.0
    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, t_subs=ISLAND_TRI_SUBS)

    kernel_only = jax.jit(lambda: render_base_planes_pallas(
        scene_f, lights, ambient, rays, h, w, **kw))
    base_sky = jax.jit(lambda s: _pallas_base(
        scene_f, lights, ambient, rays, s, sh, sw, day_frac, h, w,
        sky_grouped=True, sky_vars=st.sky_vars, **kw))
    full = jax.jit(lambda s: apply_fxaa_pallas(base_sky(s), st.aa))

    variants = {
        "kernel_only": (lambda _: kernel_only()[0], None),
        "kernel+sky": (base_sky, stack),
        "kernel+sky+fxaa": (full, stack),
    }

    def block(fn, arg, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(arg)
        device_sync(out if not isinstance(out, tuple) else out[0])
        return (time.perf_counter() - t0) / n * 1e3

    for name, (fn, arg) in variants.items():
        device_sync(fn(arg) if not isinstance(fn(arg), tuple) else fn(arg)[0])
    meds = {}
    for r in range(args.reps):
        for name, (fn, arg) in variants.items():
            meds.setdefault(name, []).append(block(fn, arg, args.n))
    for name, v in meds.items():
        print(f"{name}: {statistics.median(v):.2f} ms "
              f"[{', '.join('%.1f' % x for x in v)}]")


if __name__ == "__main__":
    main()
