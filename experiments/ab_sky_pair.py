#!/usr/bin/env python
"""Interleaved A/B: pre-blended grouped resolve vs static-stack pair resolve.

Isolates the cost of the static sky stack's pair resolve against the round-2
pre-blended single-plane resolve on the SAME megakernel output, same state,
same session — the only way to tell a real resolve regression from tunnel
drift. Runs both a pure-band state (one-gather branch vs old path: expect
~0) and a mid-fade state (two-gather blend branch: expect ~+2 ms — the
price that replaced the +15.7 ms full-panorama rebuild).

  python experiments/ab_sky_pair.py [--sky reference]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracing_cuda_tpu.render.pipeline import _pallas_base
from raytracing_cuda_tpu.render.fxaa import apply_fxaa_pallas
from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                ISLAND_TRI_CLUSTERS,
                                                build_scene)
from raytracing_cuda_tpu.scene.textures import (blend_sky, load_skies,
                                                pack_sky_phases,
                                                sky_static_init)
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import enable_compilation_cache
from raytracing_cuda_tpu.utils.timing import device_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sky", default="reference")
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n", type=int, default=12)
    args = ap.parse_args()

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))
    scene = jax.device_put(build_scene())
    texels = jax.device_put(jnp.asarray(load_skies(args.sky).texels))
    sh, sw = texels.shape[1], texels.shape[2]
    stack = jax.jit(sky_static_init)(texels)

    def make(day, pair):
        st = sim.settle(sim.init_state()._replace(day_time=jnp.float32(day)))
        scene_f, lights, ambient = jax.jit(sim.derive_frame)(scene, st)
        rays = jax.jit(sim.camera_rays, static_argnums=1)(st.cam, w / h)
        day_frac = float(st.day_time) / 24.0
        kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
                  sph_clusters=ISLAND_SPH_CLUSTERS, sky_grouped=True)
        if pair:
            fn = jax.jit(lambda s: _pallas_base(
                scene_f, lights, ambient, rays, s, sh, sw, day_frac, h, w,
                sky_vars=st.sky_vars, **kw))
            arg = stack
        else:
            fn = jax.jit(lambda s: _pallas_base(
                scene_f, lights, ambient, rays, s, sh, sw, day_frac, h, w,
                **kw))
            arg = jax.jit(lambda t, sv: pack_sky_phases(blend_sky(t, sv)))(
                texels, st.sky_vars)
        out = jax.jit(lambda s: apply_fxaa_pallas(fn(s), st.aa))
        return out, arg

    def block(fn, arg, n):
        t0 = time.perf_counter()
        img = None
        for _ in range(n):
            img = fn(arg)
        device_sync(img)
        return (time.perf_counter() - t0) / n * 1e3

    for day, name in ((14.0, "pure band"), (9.0, "mid-fade")):
        fa, aa_ = make(day, False)   # A: round-2 pre-blended resolve
        fb, ab_ = make(day, True)    # B: static-stack pair resolve
        print(f"compiling day={day} ...", flush=True)
        device_sync(fa(aa_)); device_sync(fb(ab_))
        block(fa, aa_, 3); block(fb, ab_, 3)
        A, B = [], []
        for r in range(args.reps):
            A.append(block(fa, aa_, args.n))
            B.append(block(fb, ab_, args.n))
        ma, mb = statistics.median(A), statistics.median(B)
        print(f"{name} (day {day}): preblended={ma:.2f} ms  "
              f"pair={mb:.2f} ms  delta={mb - ma:+.2f} ms\n"
              f"  A={['%.1f' % v for v in A]}\n  B={['%.1f' % v for v in B]}",
              flush=True)


if __name__ == "__main__":
    main()
