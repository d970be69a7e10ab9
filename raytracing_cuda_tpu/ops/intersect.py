"""Vectorized ray-primitive intersection (checkHit, kernel.cu:41-129).

Two documented, deliberately-unreplicated reference quirks (both
measure-zero; everything else matches exactly):
- the nearest-hit scan's `minHitDist == -1` sentinel (kernel.cu:145) lets
  ANY later hit replace a best hit whose t computed to exactly -1.0f; all
  paths here keep the true minimum-t, lowest-index winner.
- the sphere quirk window compares float d2 to the C++ DOUBLE literal
  -0.01; the f32 ports compare to f32(-0.01) = -0.009999999776, which
  flips the accept only at that single representable value.

The reference tests one ray against one object per call inside divergent
per-thread loops. Here each routine tests a batch of rays against all
primitives of one type at once — masked vector lanes instead of branches —
and nearest-hit / occlusion reductions replace the sequential loops
(kernel.cu:144-151, 188-193).

Epsilon constants and accept/reject comparisons match the reference exactly
(sphere kernel.cu:47-69, plane :71-94, Möller-Trumbore triangle :95-126),
including quirks: sphere hits keep a possibly-negative near-root distance,
the plane normal is never flipped toward the ray, and triangles are
backface-culled with det < 0.001.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.core.types import Scene

# plain numpy scalar: module import must not initialize a jax backend
INF = np.float32(np.inf)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def intersect_spheres(o, d, pos, r):
    """Geometric sphere test (kernel.cu:47-69).

    o, d: (..., 3) ray origins/directions. pos: (S, 3), r: (S,).
    Returns (hit (..., S) bool, t (..., S) f32). t is tca - thc and may be
    negative (origin inside the sphere) exactly like the reference.
    """
    L = pos - o[..., None, :]              # (..., S, 3)
    tca = _dot(L, d[..., None, :])         # (..., S)
    d2 = _dot(L, L) - tca * tca
    r2 = r * r
    hit = (tca > 0) & (d2 < r2) & (d2 > -0.01)
    thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    return hit, tca - thc


def intersect_plane(o, d, ppos, pnormal):
    """Infinite plane test (kernel.cu:71-94). Returns (hit (...,), t (...,))."""
    denom = _dot(d, pnormal)
    t = _dot(ppos - o, pnormal) / denom
    hit = (denom * denom > 0.00001) & (t >= 0)
    return hit, t


def intersect_triangles(o, d, v0, e1, e2):
    """Möller-Trumbore with backface cull (kernel.cu:95-126).

    v0, e1, e2: (T, 3) with e1 = v1-v0, e2 = v2-v0.
    Returns (hit (..., T) bool, t (..., T)).
    """
    d_ = d[..., None, :]                   # (..., 1, 3)
    pvec = jnp.cross(d_, e2)               # (..., T, 3)
    det = _dot(e1, pvec)                   # (..., T)
    inv_det = 1.0 / det
    tvec = o[..., None, :] - v0
    u = _dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = _dot(d_, qvec) * inv_det
    t = _dot(e2, qvec) * inv_det
    hit = (det >= 0.001) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return hit, t


def all_hits(scene: Scene, o, d):
    """Distances to every object: (t (..., N_concat), gidx (N_concat,)).

    Concat order is [plane, triangles, spheres]; gidx carries each slot's
    reference object index for tie-breaking and attribute gathers. Misses are
    +inf.
    """
    hit_p, t_p = intersect_plane(o, d, scene.plane_pos, scene.plane_normal)
    hit_t, t_t = intersect_triangles(o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2)
    hit_s, t_s = intersect_spheres(o, d, scene.sph_pos, scene.sph_r)

    t = jnp.concatenate(
        [
            jnp.where(hit_p, t_p, INF)[..., None],
            jnp.where(hit_t, t_t, INF),
            jnp.where(hit_s, t_s, INF),
        ],
        axis=-1,
    )
    gidx = jnp.concatenate([jnp.zeros(1, jnp.int32), scene.tri_gidx, scene.sph_gidx])
    return t, gidx


def nearest_hit(scene: Scene, o, d):
    """Closest-hit query (kernel.cu:144-151).

    Returns (hit_any (...,), t_min (...,), winner_gidx (...,)).
    Ties on exactly-equal t resolve to the smallest reference object index,
    matching the sequential scan's strict '<' update.
    """
    t, gidx = all_hits(scene, o, d)
    t_min = jnp.min(t, axis=-1)
    hit_any = jnp.isfinite(t_min)
    big = jnp.int32(10_000)
    winner = jnp.min(jnp.where(t == t_min[..., None], gidx, big), axis=-1)
    return hit_any, t_min, jnp.where(hit_any, winner, -1)


def occluded(scene: Scene, o, d, max_dist):
    """Hard-shadow occlusion (kernel.cu:188-193).

    True where any non-emissive object intersects the ray closer than
    max_dist (...,). Light proxy spheres never occlude.
    """
    hit_p, t_p = intersect_plane(o, d, scene.plane_pos, scene.plane_normal)
    hit_t, t_t = intersect_triangles(o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2)
    hit_s, t_s = intersect_spheres(o, d, scene.sph_pos, scene.sph_r)
    sph_blocks = jnp.logical_not(scene.is_light[scene.sph_gidx])

    md = max_dist[..., None]
    any_tri = jnp.any(hit_t & (t_t < md), axis=-1)
    any_sph = jnp.any(hit_s & sph_blocks & (t_s < md), axis=-1)
    any_pl = hit_p & (t_p < max_dist)
    return any_pl | any_tri | any_sph
