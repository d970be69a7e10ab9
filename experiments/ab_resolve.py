#!/usr/bin/env python
"""Interleaved A/B of grouped-resolve knob combos
(SKY_SELECT x SKY_ANCHOR x SKY_PASSES x SKY_LAYOUT).

The resolve is ~2.7 ms pure-band / ~3.8 ms in-fade at 720p in the flat
layout, ~2.0 / ~3.0 in the gt layout (decomposition + ledger,
docs/PERFORMANCE.md) — the #2 frame cost after the megakernel. All knob
combos are exact on covered pixels (twostage select is bit-identical to
onehot; gt is bit-identical wholesale; the anchor only affects coverage).
Times kernel+sky (the FXAA tail is constant) round-robin per rep.

  python experiments/ab_resolve.py [--day 17.6 --yaw 315]
"""

import argparse
import itertools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
    ap.add_argument("--day", type=float, default=17.6)
    ap.add_argument("--yaw", type=float, default=315.0)
    ap.add_argument("--sky", default="reference")
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--selects", default="twostage",
                    help="comma list of SKY_SELECT values to sweep")
    ap.add_argument("--anchors", default="median",
                    help="comma list of SKY_ANCHOR values to sweep")
    ap.add_argument("--passes", default="3,2",
                    help="comma list of SKY_PASSES values to sweep")
    ap.add_argument("--layouts", default="",
                    help="comma list of SKY_LAYOUT values (flat,auto)")
    args = ap.parse_args()

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))
    scene = jax.device_put(build_scene())
    texels = jax.device_put(jnp.asarray(T.load_skies(args.sky).texels))
    sh, sw = texels.shape[1], texels.shape[2]
    stack = jax.jit(T.sky_static_init)(texels)

    from bench import preset_state   # ONE pose builder for every harness

    st = preset_state(day=args.day, yaw=args.yaw)
    scene_f, lights, ambient = jax.jit(sim.derive_frame)(scene, st)
    rays = jax.jit(sim.camera_rays, static_argnums=1)(st.cam, w / h)
    day_frac = float(st.day_time) / 24.0
    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, t_subs=ISLAND_TRI_SUBS,
              sky_grouped=True)

    fns = {}
    selects = args.selects.split(",")
    anchors = args.anchors.split(",")
    layouts = args.layouts.split(",") if args.layouts else [T.SKY_LAYOUT]
    # The gt layout engages only for the median anchor and ignores
    # SKY_SELECT entirely — under the default "auto" layout a select sweep
    # would trace IDENTICAL programs (timing tunnel noise) and an anchor
    # sweep would flip median arms to gt while others fall back flat
    # (timing anchor+layout conflated). Pin flat so arms differ only by
    # the knob under test; pass --layouts explicitly to override.
    if (len(selects) > 1 or len(anchors) > 1) and not args.layouts:
        print("select/anchor sweep: pinning SKY_LAYOUT='flat' so every arm "
              "runs the layout that actually reads these knobs")
        layouts = ["flat"]
    for sel, anc, passes, lay in itertools.product(
            selects, anchors, [int(p) for p in args.passes.split(",")],
            layouts):
        T.SKY_SELECT, T.SKY_ANCHOR, T.SKY_PASSES = sel, anc, passes
        T.SKY_LAYOUT = lay
        eff = "gt" if lay != "flat" and anc == "median" else "flat"
        name = f"{sel}/{anc}/p{passes}/{lay}({eff})"
        fn = jax.jit(lambda s: _pallas_base(
            scene_f, lights, ambient, rays, s, sh, sw, day_frac, h, w,
            sky_vars=st.sky_vars, **kw))
        print(f"compiling {name} ...", flush=True)
        device_sync(fn(stack))
        fns[name] = fn
    # restore the SHIPPED module defaults (not a hard-coded combo: anything
    # traced after this sweep must match what engines actually run)
    import importlib
    importlib.reload(T)

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
    for r in range(args.reps):
        for k, fn in fns.items():
            med[k].append(block(fn, args.n))
        print(f"rep {r}: " + "  ".join(f"{k}={med[k][-1]:.2f}"
                                       for k in fns), flush=True)
    for k in sorted(med, key=lambda k: statistics.median(med[k])):
        print(f"{k}: {statistics.median(med[k]):.2f} ms")


if __name__ == "__main__":
    main()
