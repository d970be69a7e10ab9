#!/usr/bin/env python
"""Quantify the planar-vs-stacked TPU mismatch ab_planar.py reported.

Reuses the exact jitted programs from the A/B (compile-cache warm) and
prints where and how much the two uint8 images differ, plus whether the
mismatch sits on sky pixels (mw > 0) — localizing it to the resolve vs
the combine."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.render import pipeline as P
from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
from raytracing_cuda_tpu.scene import textures as T
from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                ISLAND_TRI_CLUSTERS,
                                                ISLAND_TRI_SUBS, build_scene)
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import enable_compilation_cache
from raytracing_cuda_tpu.utils.timing import device_sync


def main():
    enable_compilation_cache()
    w, h = 1280, 720
    scene = jax.device_put(build_scene())
    texels = jax.device_put(jnp.asarray(T.load_skies("reference").texels))
    sh, sw = texels.shape[1], texels.shape[2]
    stack = jax.jit(T.sky_static_init)(texels)

    from bench import preset_state

    st = preset_state(day=14.0, yaw=0.0)
    scene_f, lights, ambient = jax.jit(sim.derive_frame)(scene, st)
    rays = jax.jit(sim.camera_rays, static_argnums=1)(st.cam, w / h)
    day_frac = float(st.day_time) / 24.0
    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, t_subs=ISLAND_TRI_SUBS,
              sky_grouped=True)

    fns = {}
    for planar in (True, False):
        P.PLANAR_EPILOGUE = planar
        fn = jax.jit(lambda s: P._pallas_base(
            scene_f, lights, ambient, rays, s, sh, sw, day_frac, h, w,
            sky_vars=st.sky_vars, **kw))
        device_sync(fn(stack))
        fns["planar" if planar else "stacked"] = fn
    P.PLANAR_EPILOGUE = True

    a = np.asarray(jax.device_get(fns["planar"](stack))).astype(np.int32)
    b = np.asarray(jax.device_get(fns["stacked"](stack))).astype(np.int32)
    d = np.abs(a - b)
    bad = d.max(axis=-1) > 0
    print(f"mismatching pixels: {bad.sum()} / {bad.size} "
          f"({bad.mean() * 100:.4f}%), max |delta| = {d.max()}")
    ys, xs = np.nonzero(bad)
    if len(ys):
        print("first 10 mismatches (y, x, planar rgb, stacked rgb):")
        for y, x in list(zip(ys, xs))[:10]:
            print(f"  ({y:4d},{x:4d})  {a[y, x].tolist()}  {b[y, x].tolist()}")

    # localize: miss-weight plane from the kernel (sky pixels have mw > 0)
    mw = np.asarray(render_base_planes_pallas(
        scene_f, lights, ambient, rays, h, w,
        tri_clusters=ISLAND_TRI_CLUSTERS, sph_clusters=ISLAND_SPH_CLUSTERS,
        t_subs=ISLAND_TRI_SUBS)[3])
    sky_px = mw > 0
    print(f"mismatches on sky pixels: {(bad & sky_px).sum()}, "
          f"on non-sky: {(bad & ~sky_px).sum()}")


if __name__ == "__main__":
    main()
