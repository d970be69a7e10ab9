#!/usr/bin/env python
"""Ablation decomposition of the grouped sky resolve's internal costs.

The resolve is ~45% of the HEADLINE (pure-band) frame after the tile-48
kernel retune, and the anchor A/Bs (docs/PERFORMANCE.md) proved the masked
median fuses to ~free — so where do the ~4.3 ms actually go? Each arm
removes ONE stage of the resolve while keeping every shape and liveness
dependency intact (diagnostic only — the ablated arms render garbage sky),
timed interleaved round-robin like every A/B in this repo:

  full        the shipped resolve (baseline)
  kernel      megakernel only (r plane) — the floor
  noresolve   sky replaced by a constant plane, epilogue kept
              (full - noresolve = the ENTIRE resolve incl. reshapes)
  noidx       _equirect_indices replaced by precomputed constant planes
              (full - noidx = the per-pixel arcsin/atan2/mod index math)
  nogather    the window fetch replaced by a tid-dependent constant
              (full - nogather = the grouped row gathers)
  nosel       the per-pixel one-hot select replaced by a window slice
              (full - nosel = the two-stage select)
  p1          SKY_PASSES=1 (full - p1 = the whole second pass)

  python experiments/resolve_decompose.py [--day 14 --yaw 0]
"""

import argparse
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
    ap.add_argument("--day", type=float, default=14.0)
    ap.add_argument("--yaw", type=float, default=0.0)
    ap.add_argument("--sky", default="reference")
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n", type=int, default=10)
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

    orig_idx = T._equirect_indices
    orig_fetch = T._fetch_rows_pair
    orig_pass = T._grouped_pass
    orig_pass_gt = T._grouped_pass_gt
    orig_passes = T.SKY_PASSES

    # constant index planes for the noidx arm (same values the real frame
    # would produce at a REPRESENTATIVE direction set — cost, not output,
    # is under test; closed over as device constants)
    iy0 = jax.device_put(jnp.zeros((h, w), jnp.int32) + sh // 3)
    ix_ramp = jax.device_put(
        jnp.broadcast_to((jnp.arange(w, dtype=jnp.int32) * sw) // (4 * w),
                         (h, w)))

    def idx_const(hh, ww, d, day_frac):
        # keep a trivial data dependency on d so XLA cannot drop the
        # megakernel->resolve edge entirely
        bump = (d[..., 0] * 0.0).astype(jnp.int32)
        return iy0 + bump, ix_ramp + bump

    def fetch_pair_const(phases_all, sky_vars):
        def fetch(tid):
            return (tid[:, None] % 7).astype(jnp.float32) + jnp.zeros(
                (tid.shape[0], T.SKY_TILE_Y * T.SKY_TILE_X), jnp.float32)
        return fetch

    arms = {}

    def build(name, **patch):
        for k, v in patch.items():
            setattr(T, k, v)
        try:
            fn = jax.jit(base)
            print(f"compiling {name} ...", flush=True)
            device_sync(fn(stack))
            arms[name] = fn
        finally:
            T._equirect_indices = orig_idx
            T._fetch_rows_pair = orig_fetch
            T._grouped_pass = orig_pass
            T._grouped_pass_gt = orig_pass_gt
            T.SKY_PASSES = orig_passes

    build("full")

    from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
    from raytracing_cuda_tpu.render.reference import quantize

    kernel_only = jax.jit(lambda s: render_base_planes_pallas(
        scene_f, lights, ambient, rays, h, w,
        tri_clusters=ISLAND_TRI_CLUSTERS, sph_clusters=ISLAND_SPH_CLUSTERS,
        t_subs=ISLAND_TRI_SUBS)[0])
    print("compiling kernel ...", flush=True)
    device_sync(kernel_only(stack))
    arms["kernel"] = kernel_only

    def noresolve(s):
        r, g, b, mw, mdx, mdy, mdz = render_base_planes_pallas(
            scene_f, lights, ambient, rays, h, w,
            tri_clusters=ISLAND_TRI_CLUSTERS,
            sph_clusters=ISLAND_SPH_CLUSTERS, t_subs=ISLAND_TRI_SUBS)
        sky = (mdx * 0.0)[..., None] + s[0, 0, :3] * 1e-9   # constant, live s
        return quantize(jnp.stack([r, g, b], axis=-1) + mw[..., None] * sky)

    fn = jax.jit(noresolve)
    print("compiling noresolve ...", flush=True)
    device_sync(fn(stack))
    arms["noresolve"] = fn

    build("noidx", _equirect_indices=idx_const)
    build("nogather", _fetch_rows_pair=fetch_pair_const)
    build("p1", SKY_PASSES=1)

    # nosel: slice instead of select, inside a copy of _grouped_pass
    def pass_slice(fetch, hh, ww, gy, gx, gv):
        ty, tx = T.SKY_TILE_Y, T.SKY_TILE_X
        hy, hx = ty // 2, tx // 2
        nty, ntx = hh // ty, ww // tx
        big = jnp.int32(1 << 29)
        ay = T._masked_median(gy, gv)[:, None]
        ax = T._masked_median(gx, gv)[:, None]
        dx = jnp.mod(gx - ax + ww // 2, ww) - ww // 2
        gxu = ax + dx
        inl = gv & (jnp.abs(gy - ay) <= 2 * ty) & (jnp.abs(dx) <= 2 * tx)
        min_iy = jnp.clip(jnp.min(jnp.where(inl, gy, big), axis=1), 0, hh - 1)
        min_ix = jnp.min(jnp.where(inl, gxu, big), axis=1)
        sy = hy * (min_iy // hy)
        sx = hx * (min_ix // hx)
        py = (sy // hy) % 2
        px = (sx // hx) % 2
        r = jnp.clip(sy // ty, 0, nty - 1)
        k = jnp.mod((sx - px * hx) // tx, ntx)
        tid = (py * 2 + px) * (nty * ntx) + r * ntx + k
        winf = fetch(tid)
        oy_raw = gy - sy[:, None]
        ox_raw = gxu - sx[:, None]
        covered = ((oy_raw >= 0) & (oy_raw < ty)
                   & (ox_raw >= 0) & (ox_raw < tx))
        g = gy.shape[1]
        texel = winf[:, :g]          # slice, not select — the ablation
        return texel, covered

    # nosel in the gt layout: winf is (NG, 128); its transpose's first G
    # rows give a (G, NG) texel plane without any per-pixel select
    def pass_slice_gt(fetch, hh, ww, gy, gx, gv):
        ty, tx = T.SKY_TILE_Y, T.SKY_TILE_X
        hy, hx = ty // 2, tx // 2
        nty, ntx = hh // ty, ww // tx
        big = jnp.int32(1 << 29)
        ay = T._masked_median_gt(gy, gv)[None, :]
        ax = T._masked_median_gt(gx, gv)[None, :]
        dx = jnp.mod(gx - ax + ww // 2, ww) - ww // 2
        gxu = ax + dx
        inl = gv & (jnp.abs(gy - ay) <= 2 * ty) & (jnp.abs(dx) <= 2 * tx)
        min_iy = jnp.clip(jnp.min(jnp.where(inl, gy, big), axis=0), 0, hh - 1)
        min_ix = jnp.min(jnp.where(inl, gxu, big), axis=0)
        sy = hy * (min_iy // hy)
        sx = hx * (min_ix // hx)
        py = (sy // hy) % 2
        px = (sx // hx) % 2
        r = jnp.clip(sy // ty, 0, nty - 1)
        k = jnp.mod((sx - px * hx) // tx, ntx)
        tid = (py * 2 + px) * (nty * ntx) + r * ntx + k
        winf = fetch(tid)
        oy_raw = gy - sy[None, :]
        ox_raw = gxu - sx[None, :]
        covered = ((oy_raw >= 0) & (oy_raw < ty)
                   & (ox_raw >= 0) & (ox_raw < tx))
        texel = winf.T[:gy.shape[0]]         # slice, not select
        return texel, covered

    build("nosel", _grouped_pass=pass_slice, _grouped_pass_gt=pass_slice_gt)

    # plumbing-only: NO anchors, NO fetch, NO select — just the group
    # reshape/pad (flat) or transpose (gt) dataflow, the covered-combine
    # and the final unpack. If this still costs what the full resolve
    # costs, the resolve is bound by its layout plumbing, not compute.
    def pass_plumb(fetch, hh, ww, gy, gx, gv):
        return gx.astype(jnp.float32), gv

    build("plumbonly", _grouped_pass=pass_plumb, _grouped_pass_gt=pass_plumb)

    def block(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(stack)
        device_sync(out)
        return (time.perf_counter() - t0) / n * 1e3

    for fn in arms.values():
        block(fn, 2)
    med = {k: [] for k in arms}
    for rep in range(args.reps):
        for k, fn in arms.items():
            med[k].append(block(fn, args.n))
        print(f"rep {rep}: " + "  ".join(f"{k}={med[k][-1]:.2f}"
                                         for k in arms), flush=True)
    full = statistics.median(med["full"])
    print(f"\nfull frame: {full:.2f} ms")
    for k in ("kernel", "noresolve", "noidx", "nogather", "nosel", "p1",
              "plumbonly"):
        m = statistics.median(med[k])
        print(f"{k}: {m:.2f} ms  -> stage cost ~{full - m:.2f} ms")


if __name__ == "__main__":
    main()
