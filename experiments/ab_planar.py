#!/usr/bin/env python
"""Interleaved A/B: planar vs stacked grouped-pair epilogue.

The resolve decomposition (resolve_decompose.py) showed the gt resolve's
remaining ~2.2 ms at 720p is pure layout plumbing — every compute arm
measured ~0 while plumb-only kept the full cost. The planar path
(PLANAR_EPILOGUE, pipeline.py + sample_sky_grouped_pair_planar) removes
every (h, w, 3) intermediate (mdir stack, sky stack, stacked combine) and
crosses ONE packed int32 plane through the gt transpose instead of three.
Bit-identical output (pinned on CPU and by test). This measures it.

  python experiments/ab_planar.py [--day 17.6 --yaw 315]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracing_cuda_tpu.render import pipeline as P
from raytracing_cuda_tpu.scene import textures as T
from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                ISLAND_TRI_CLUSTERS,
                                                ISLAND_TRI_SUBS, build_scene)
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import enable_compilation_cache
from raytracing_cuda_tpu.utils.timing import device_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--day", type=float, default=14.0)
    ap.add_argument("--yaw", type=float, default=0.0)
    ap.add_argument("--sky", default="reference")
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))
    scene = jax.device_put(build_scene())
    texels = jax.device_put(jnp.asarray(T.load_skies(args.sky).texels))
    sh, sw = texels.shape[1], texels.shape[2]
    stack = jax.jit(T.sky_static_init)(texels)

    from bench import preset_state

    st = preset_state(day=args.day, yaw=args.yaw)
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
        name = "planar" if planar else "stacked"
        print(f"compiling {name} ...", flush=True)
        device_sync(fn(stack))
        fns[name] = fn
    P.PLANAR_EPILOGUE = True

    img_a = jax.device_get(fns["planar"](stack))
    img_b = jax.device_get(fns["stacked"](stack))
    same = (img_a == img_b).all()
    print(f"bit-identical on TPU: {same}")

    def block(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(stack)
        device_sync(out)
        return (time.perf_counter() - t0) / n * 1e3

    for fn in fns.values():
        block(fn, 2)
    med = {k: [] for k in fns}
    wins = 0
    for rep in range(args.reps):
        for k, fn in fns.items():
            med[k].append(block(fn, args.n))
        wins += med["planar"][-1] < med["stacked"][-1]
        print(f"rep {rep}: planar={med['planar'][-1]:.2f}  "
              f"stacked={med['stacked'][-1]:.2f}", flush=True)
    mp = statistics.median(med["planar"])
    ms = statistics.median(med["stacked"])
    print(f"\nplanar {mp:.2f} ms vs stacked {ms:.2f} ms "
          f"({(ms - mp) / ms * 100:+.1f}%), planar won {wins}/{args.reps}")


if __name__ == "__main__":
    main()
