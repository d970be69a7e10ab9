"""Interleaved A/B of megakernel cluster configurations on the TPU.

Measures ONLY the megakernel (render_base_planes_pallas) under two static
cluster layouts, alternating timed blocks of identical pipelined programs
(docs/PERFORMANCE.md measurement discipline). Usage:

  python experiments/ab_clusters.py --b "58,8,8,8,8,8,8"
  python experiments/ab_clusters.py --tile-b 8x256   # tile-size A/B
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                ISLAND_TRI_CLUSTERS,
                                                build_scene)
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.config import enable_compilation_cache
from raytracing_cuda_tpu.utils.timing import device_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default=None, help="tri clusters A (default: shipped)")
    ap.add_argument("--b", default=None, help="tri clusters B")
    ap.add_argument("--sph-a", default=None,
                    help="sphere clusters, e.g. '24:1,2:0' (count:occludes)")
    ap.add_argument("--sph-b", default=None)
    ap.add_argument("--tile-a", default="16x256")
    ap.add_argument("--tile-b", default=None)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--day", type=float, default=14.0)
    ap.add_argument("--cam", type=int, default=None,
                    help="camera preset (0=island, 1=mountains)")
    ap.add_argument("--yaw", type=float, default=None,
                    help="override camera hor_angle (worst-pose probes)")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--max-clusters", type=int, default=None)
    ap.add_argument("--t-bound-a", type=int, default=1)
    ap.add_argument("--t-bound-b", type=int, default=1)
    ap.add_argument("--split-a", type=int, default=1)
    ap.add_argument("--split-b", type=int, default=1)
    ap.add_argument("--subs-a", default=None,
                    help="per-tri-cluster sub-bound counts, e.g. "
                         "'1,1,1,1,1,1,1,2,2,2,2,2,2' (pairs → per-mountain)")
    ap.add_argument("--subs-b", default=None)
    args = ap.parse_args()

    if args.max_clusters:
        from raytracing_cuda_tpu.render import pallas_rt
        pallas_rt.MAX_CLUSTERS = args.max_clusters
        pallas_rt.N_PARAMS = pallas_rt.P_CLUSTERS + 4 * args.max_clusters

    enable_compilation_cache()
    w, h = (int(v) for v in args.size.split("x"))

    def tri(s):
        return tuple(int(v) for v in s.split(",")) if s else ISLAND_TRI_CLUSTERS

    def tile(s):
        return tuple(int(v) for v in s.split("x"))

    def sph(s):
        if not s:
            return ISLAND_SPH_CLUSTERS
        return tuple((int(c.split(":")[0]), bool(int(c.split(":")[1])))
                     for c in s.split(","))

    def subs(s):
        return tuple(int(v) for v in s.split(",")) if s else None

    ta, tb = tri(args.a), tri(args.b)
    sa, sb = sph(args.sph_a), sph(args.sph_b)
    ua, ub = subs(args.subs_a), subs(args.subs_b)
    tile_a = tile(args.tile_a)
    tile_b = tile(args.tile_b) if args.tile_b else tile_a
    if (ta == tb and sa == sb and tile_a == tile_b and ua == ub
            and args.t_bound_a == args.t_bound_b
            and args.split_a == args.split_b):
        raise SystemExit("A and B are identical — vary --a/--b, --sph-*, "
                         "--subs-*, --tile-*, --t-bound-* or --split-*")

    scene = jax.device_put(build_scene())
    st = sim.init_state()._replace(day_time=jnp.float32(args.day))
    if args.cam is not None:
        import numpy as np
        from raytracing_cuda_tpu.sim.actions import Action
        st = sim.apply_controls(
            st, Action.idle()._replace(cam_preset=np.int32(args.cam)), 0.0)
        st = st._replace(day_time=jnp.float32(args.day))
    if args.yaw is not None:
        st = st._replace(cam=st.cam._replace(hor_angle=jnp.float32(args.yaw)))
    st = sim.settle(st)
    scene_f, lights, ambient = jax.jit(sim.derive_frame)(scene, st)
    rays = jax.jit(sim.camera_rays, static_argnums=1)(st.cam, w / h)

    def make(tc, sc, th, tw, tbf, split, t_subs):
        fn = jax.jit(lambda: render_base_planes_pallas(
            scene_f, lights, ambient, rays, h, w, tile_h=th, tile_w=tw,
            tri_clusters=tc, sph_clusters=sc, t_bound=bool(tbf),
            lane_split=split, t_subs=t_subs))
        return fn

    fa = make(ta, sa, *tile_a, args.t_bound_a, args.split_a, ua)
    fb = make(tb, sb, *tile_b, args.t_bound_b, args.split_b, ub)

    def block(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        device_sync(out[0])
        return (time.perf_counter() - t0) / n * 1e3

    print(f"A: tri={ta} sph={sa} tile={tile_a}\n"
          f"B: tri={tb} sph={sb} tile={tile_b}")
    print("compiling A...", flush=True)
    ia = fa()
    print("compiling B...", flush=True)
    ib = fb()
    # sanity: BIT-identical pixels (culling is conservative; layout changes
    # only reorder pad rows) — any deviation means a non-conservative config
    # whose timing must not be trusted
    for x, y in zip(ia, ib):
        d = float(jnp.max(jnp.abs(x - y)))
        assert d == 0.0, f"outputs differ: max {d}"
    block(fa, 3)
    block(fb, 3)
    A, B = [], []
    for r in range(args.reps):
        A.append(block(fa, args.n))
        B.append(block(fb, args.n))
        print(f"rep {r}: A {A[-1]:.2f} ms   B {B[-1]:.2f} ms", flush=True)
    print(f"median A {statistics.median(A):.2f} ms   "
          f"B {statistics.median(B):.2f} ms")


if __name__ == "__main__":
    main()
