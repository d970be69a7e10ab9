#!/usr/bin/env python
"""A/B the grouped sky resolve's GROUP SIZE at a given frame size.

The 1080p resolve decomposition (2026-08-19, resolve_decompose.py
--size 1920x1080) put the whole resolve at ~7 ms with every internal
stage measuring ~free — the cost is carrying the (G, NG) dataflow,
which scales with NG = pixels/group. Doubling the group halves NG, the
fetched (NG, 128) window tensor (66 MB at 1080p), and the gather-index
count. The risk is coverage, not correctness: covered pixels return the
EXACT texel at any group size (the anchor only picks the window);
pixels whose texel misses every pass's window clamp to the nearest
fetched texel. At 1080p, 32 adjacent pixels span ~22 sky texels
(8192-texel panorama, ~58 deg horizontal FOV over 1920 px) — inside one
32x4-texel window; 720p is marginal (~33 texels per 32 pixels), which
is why SKY_GROUP=16 shipped there.

Interleaved round-robin medians (the house discipline) + rmse of each
arm vs the shipped group-16 frame. Parity context: the compiled-vs-
oracle gates pass at rmse <= ~0.0013, so an arm whose rmse *vs shipped*
sits well under that cannot move the gates materially.

  python experiments/ab_sky_group.py [--size 1920x1080 --day 14 --yaw 0]
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
import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.scene import textures as T
from raytracing_cuda_tpu.render.pipeline import _pallas_base
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
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--groups", default="16,32",
                    help="comma list of SKY_GROUP values to A/B")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (interpret kernel, tiny reps)")
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
              sky_grouped=True, interpret=args.interpret)

    base = lambda s: _pallas_base(scene_f, lights, ambient, rays, s, sh, sw,
                                  day_frac, h, w, sky_vars=st.sky_vars, **kw)

    orig_group = T.SKY_GROUP
    arms = {}
    frames = {}
    for g in (int(v) for v in args.groups.split(",")):
        name = f"g{g}"
        T.SKY_GROUP = g
        try:
            fn = jax.jit(base)
            print(f"compiling {name} ...", flush=True)
            out = fn(stack)
            device_sync(out)
            arms[name] = fn
            frames[name] = np.asarray(out)
        finally:
            T.SKY_GROUP = orig_group

    ref_name = next(iter(frames))
    ref = frames[ref_name].astype(np.float64)
    for name, img in frames.items():
        diff = np.abs(img.astype(np.float64) - ref)
        rmse = float(np.sqrt(np.mean((diff / 255.0) ** 2)))
        print(f"{name}: rmse vs {ref_name} = {rmse:.6f}  "
              f"max px diff = {diff.max():.0f}", flush=True)

    if args.interpret:
        return
    meds = {name: [] for name in arms}
    for rep in range(args.reps):
        line = []
        for name, fn in arms.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(args.n):
                out = fn(stack)
            device_sync(out)
            ms = (time.perf_counter() - t0) / args.n * 1e3
            meds[name].append(ms)
            line.append(f"{name}={ms:.2f}")
        print(f"rep {rep}: " + "  ".join(line), flush=True)
    print()
    base_med = statistics.median(meds[ref_name])
    for name, ms in meds.items():
        m = statistics.median(ms)
        print(f"{name}: {m:.2f} ms (delta vs {ref_name} {m - base_med:+.2f})",
              flush=True)


if __name__ == "__main__":
    main()
