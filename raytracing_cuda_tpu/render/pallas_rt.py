"""Raytracing Pallas TPU megakernel.

The TPU-native counterpart of the reference's `raytracing` CUDA kernel
(kernel.cu:228-259) — but where CUDA runs one divergent thread per pixel,
this kernel runs one grid step per (TILE_H, TILE_W) pixel tile and keeps the
ENTIRE working set in VMEM: the scene (packed into one (N_OBJ_PAD, 1, R)
coefficient tensor, ~70 KB), every intersection plane, and the full bounce
carry. One kernel launch renders the whole pre-sky framebuffer; nothing
round-trips HBM between bounces.

Structure per tile (one fori_loop iteration per bounce level, everything
inside flattened SIBLING lax.conds — Mosaic cannot legalize nested scf.if):
  - primary rays from frustum-corner interpolation (kernel.cu:244-253),
    generated in-kernel from iota — no ray buffer in HBM; static
    (row0, total_height) lets multi-chip shards render bands with
    globally-correct rays.
  - each triangle cluster runs sweep + local winner-reduce + local one-hot
    attribute sums in its own cond, gated on tile liveness AND a sound
    bounding-sphere interval cull against the tile's ray box; spheres get
    their own cond; the sea plane is cheap 2D math. The cross-group combine
    is a few lexicographic (t, gidx) selects (tie-break parity with the
    strict-'<' scan, kernel.cu:144-151). No gathers anywhere — XLA lowers
    them catastrophically on TPU.
  - intersection sweeps evaluate the linear-form tests (ops.linear_forms
    docstring) over object-batched (rows, TILE_H, TILE_W) tensors;
    occlusion sweeps repeat the cull-and-cond pattern per light
    (kernel.cu:188-193).
  - the shading/mirror tail (transcendentals) runs in its own cond only
    when some lane hit; live lanes carry as f32 masks (i1 loop carries are
    unsupported).
  - misses record (throughput, direction); the equirect sky gather
    (kernel.cu:156-163) runs once per pixel afterwards in XLA, fused with
    the final combine + quantize.

Outputs 7 (H, W) f32 planes: hit-path RGB, miss weight, miss direction xyz.
Tile size (48, 128) won the round-3 `bench.py --tune` sweeps: the first
sweep's winner (32, 128) beat round 2's (16, 256) 10.47 vs 10.99 ms at
720p, then extending the TH axis found (48, 128) at 9.63 ms — confirmed
interleaved vs (32, 128) at day 14 (10.16 vs 9.47) and the worst pose
(10.08 vs 9.37); (64, 128) regresses (12.4). The optimum moved after the
while-loop exit + zero-pad clusters + t-bound + sub-bound changes.
Re-run `--tune` on new silicon or after kernel-structure changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_cuda_tpu.core.types import Lights, Scene

f32 = jnp.float32

MAX_DEPTH = 4        # kernel.cu:11
BIG = 1e30           # finite stand-in for +inf (avoids inf-inf NaN traps)

# --- packed scene-tensor channel map (lanes of the (N_OBJ_PAD, 1, R) tensor) ---
C_COL = 0            # 0-2   color rgb
C_SHINE = 3
C_SPEC = 4           # specular exponent
C_KR = 5             # mirror coefficient
C_FLAGS = 6          # islight*2 + issph (one attr reduction for both)
C_UNUSED7 = 7
C_CENTER = 8         # 8-10  sphere center (shading normal)
C_NORMAL = 11        # 11-13 static normal (plane/tris)
C_POS2 = 14          # sphere |pos|^2
C_R2 = 15            # sphere r^2
C_CDET = 16          # 16-18 tri e2×e1
C_AU = 19            # 19-21 tri v0×e2
C_BU = 22            # 22-24 tri e2
C_AV = 25            # 25-27 tri e1×v0
C_BV = 28            # 28-30 tri e1
C_N = 31             # 31-33 tri e1×e2
C_V0N = 34           # tri v0·n
C_VALID = 35         # spare (packed 1 for real rows but never read: padding
                     # rejection rides C_R2 = −1 for spheres, det = 0 for tris)
C_BLOCKS = 36        # occludes shadow rays (non-emissive), kernel.cu:188-193
C_GIDX = 37          # reference object index (f32-exact; tie-break key)
N_CHANNELS = 40

# --- params vector layout (SMEM) ---
P_CAMPOS = 0         # 0-2
P_LD = 3             # 3-5
P_RD = 6
P_LU = 9
P_RU = 12
P_LPOS0 = 15         # 15-17 light 0 position
P_LPOS1 = 18
P_LCOL0 = 21         # 21-23
P_LCOL1 = 24
P_LINT = 27          # 27-28 intensities
P_AMBIENT = 29       # 29-31
P_SEAY = 32          # sea plane height
P_ROW0 = 33          # global row offset of this shard's band (f32-exact int;
                     # lives in SMEM so ONE compiled kernel serves every band)
P_CLUSTERS = 36      # up to MAX_CLUSTERS x (cx, cy, cz, r) cull-bound slots:
MAX_CLUSTERS = 24    # triangle cluster SUB-bounds first (t_subs may refine
                     # a sweep cluster into several tighter bounds, OR-ed in
                     # the cull), then sphere cluster bounds
N_PARAMS = P_CLUSTERS + 4 * MAX_CLUSTERS

_AUTOTUNE = None


def _load_autotune() -> dict:
    """autotune.json from the repo root (empty dict when absent/invalid)."""
    global _AUTOTUNE
    if _AUTOTUNE is None:
        import json
        import pathlib
        path = pathlib.Path(__file__).resolve().parents[2] / "autotune.json"
        try:
            _AUTOTUNE = json.loads(path.read_text())
        except (OSError, ValueError):
            _AUTOTUNE = {}
    return _AUTOTUNE


# Shipped launch-tile defaults: the committed `bench.py --tune` winner
# (autotune.json's flagship top level), falling back to the round-3
# measured optimum when the file is absent. Resolved at IMPORT so an
# unattended retune (the watcher-fired recovery session) can never leave
# the signature defaults and the committed winner disagreeing
# (test_kernel_defaults_match_autotune pins them together). Every caller
# that pads a framebuffer to tile multiples must use THESE, not a
# literal: partial edge blocks run ~14x slower on Mosaic.
DEFAULT_TILE_H = int(_load_autotune().get("tile_h", 48))
DEFAULT_TILE_W = int(_load_autotune().get("tile_w", 128))
DEFAULT_T_BOUND = bool(_load_autotune().get("t_bound", True))
DEFAULT_LANE_SPLIT = int(_load_autotune().get("lane_split", 1))

# Below-horizon light cull (see the `hcull` block in _make_kernel.step):
# ON by default — interleaved TPU A/B 2026-08-18 (docs/PERFORMANCE.md):
# worst pose 10.15 → 8.56 ms (−1.59), day pose 10.14 → 8.42 ms (−1.72);
# output-identical (test_hcull_bit_identical). ablate=("nohcull",) is the
# decomposition arm that measures the cull's value at any pose.
HCULL_DEFAULT = True

# Specular gate ("specgate"): hoist each light's Phong-specular chain
# (reflect + _norm3 + the exp2/log2 power — the transcendental tail the
# post-hcull decomposition put inside the now-largest shading slice) out of
# shade_fn into a sibling lax.cond per light, skipped when (a) no shaded
# lane in the tile is shiny, or (b) the hcull conditions hold tile-wide
# (light strictly below the sea plane, every needy lane's hit strictly
# above it, every needy shadow ray steep enough for _plane_t's accept
# test) — under (b) every needy lane's occ_pl term fires, so the
# post-occlusion angle is exactly 0 on every shaded lane (non-needy shaded
# lanes have angle == 0 by construction), and spec ≡ spec_pow·shine·0 = 0
# with spec_pow finite; under (a) spec ≡ 0 via its own shine mask. Either
# way the skip is output-identical (test_specgate_bit_identical; non-
# shaded lanes may see different phr intermediates, but w masks them).
# OFF by default: MEASURED-NEUTRAL on this tunnel (interleaved TPU A/B
# 2026-08-18, ablate=("specgate",) vs full: worst pose 7.86 → 7.84 ms,
# day 5.47 → 5.43 — both within rep spread). The transcendental chain
# fuses to ~free beside the sweeps' port pressure (the div/sqrt-free
# occlusion lesson again: elementwise op counting loses to the fusion
# model). Kept, pinned, and free when off — re-A/B on dedicated silicon
# where VPU/transcendental balance differs; a flip requires re-warming
# the compile cache with `python bench.py` (the traced program changes).
SPECGATE_DEFAULT = False


def launch_knobs(height: int, width: int) -> dict:
    """Launch knobs for a frame size (VERDICT r3 #4: the tile optimum is
    known to move, and a 720p winner need not win at 1080p).

    Resolution order PER KEY: autotune.json `sizes["WxH"]` exact match →
    the top-level (flagship 720p) winner → the compiled-in defaults (a
    partial per-size entry falls through to the top level, not straight to
    the constants). Callers that pad framebuffers must pad with THESE knobs
    so padding and grid agree (render_base_planes_pallas resolves them
    itself when not given)."""
    tuned = _load_autotune()
    per = tuned.get("sizes", {}).get(f"{width}x{height}", {})

    def get(k, default):
        return per.get(k, tuned.get(k, default))

    return {
        "tile_h": get("tile_h", DEFAULT_TILE_H),
        "tile_w": get("tile_w", DEFAULT_TILE_W),
        "t_bound": get("t_bound", DEFAULT_T_BOUND),
        "lane_split": get("lane_split", DEFAULT_LANE_SPLIT),
    }


def _round_up(x, m):
    return (x + m - 1) // m * m


def tri_cluster_pads(T: int, tri_clusters) -> tuple:
    """Padded row count per triangle cluster (each a multiple of 8)."""
    if not tri_clusters:
        tri_clusters = (T,)
    assert sum(tri_clusters) == T, (tri_clusters, T)
    return tuple(_round_up(c, 8) for c in tri_clusters)


def sph_cluster_norm(S: int, sph_clusters):
    """Normalize sph_clusters → (counts, pads, occludes) tuples.

    sph_clusters: ((count, occludes_bool), ...) contiguous over the scene's
    sphere order, or None for one all-occluding cluster. An occludes=False
    cluster (emissive proxies) is statically skipped by shadow sweeps."""
    if not sph_clusters:
        sph_clusters = ((S, True),)
    counts = tuple(c for c, _ in sph_clusters)
    assert sum(counts) == S, (sph_clusters, S)
    return (counts, tuple(_round_up(c, 8) for c in counts),
            tuple(bool(o) for _, o in sph_clusters))


def tri_sub_partition(tri_clusters, t_subs):
    """Refined triangle partition for cull bounds.

    t_subs[k] (default 1) splits sweep cluster k's bound into that many
    equal consecutive sub-bounds — the sweep still runs the whole cluster,
    but its cull becomes an OR of tighter tests (e.g. a mountain PAIR swept
    as 8 rows keeps two per-mountain bounds: near-horizontal shadow rays
    graze single mountains far more often than pair-wide spheres).
    Returns the flat list of sub-cluster triangle counts.
    """
    if not t_subs:
        return tuple(tri_clusters)
    if len(t_subs) != len(tri_clusters):
        raise ValueError(f"t_subs {t_subs} must have one entry per tri "
                         f"cluster {tri_clusters}")
    out = []
    for cnt, m in zip(tri_clusters, t_subs):
        if cnt % m:
            raise ValueError(f"t_subs {m} must divide cluster count {cnt}")
        out.extend([cnt // m] * m)
    return tuple(out)


def pack_scene(scene: Scene, tri_clusters=None, sph_clusters=None):
    """Build the (N_OBJ_PAD, 1, N_CHANNELS) coefficient tensor.

    Slot 0 is the sea plane, then the triangle clusters, then the sphere
    clusters (each cluster padded to a multiple of 8 rows so the kernel can
    slice them statically). Tie-break relies only on the C_GIDX channel, so
    slot order is free. Assembled as one concatenation per segment to keep
    the per-frame XLA op count low. Runs inside jit each frame.
    """
    T, S = scene.n_triangles, scene.n_spheres
    pads = tri_cluster_pads(T, tri_clusters)
    t_pad = sum(pads)
    s_counts, s_pads, _ = sph_cluster_norm(S, sph_clusters)
    s_pad = sum(s_pads)
    n_pad = _round_up(1 + t_pad + s_pad, 8)

    def col(v):
        v = jnp.asarray(v, f32)
        return v[:, None] if v.ndim == 1 else v

    def zeros(n, c):
        return jnp.zeros((n, c), f32)

    v0, e1, e2 = scene.tri_v0, scene.tri_e1, scene.tri_e2
    n = jnp.cross(e1, e2)
    tg = scene.tri_gidx
    ones_t = jnp.ones((T, 1), f32)
    tri_rows = jnp.concatenate([
        col(scene.color[tg]), col(scene.shine[tg]), col(scene.specular[tg]),
        col(scene.mirror[tg]), zeros(T, 2),            # flags, unused
        zeros(T, 3), col(scene.static_normal[tg]),     # center, normal
        zeros(T, 2),                                   # pos2, r2
        col(jnp.cross(e2, e1)), col(jnp.cross(v0, e2)), col(e2),
        col(jnp.cross(e1, v0)), col(e1), col(n),
        col(jnp.sum(v0 * n, axis=-1)),
        ones_t, ones_t,                                # valid, blocks
        col(tg.astype(f32)), zeros(T, N_CHANNELS - C_GIDX - 1),
    ], axis=1)

    sg = scene.sph_gidx
    pos = scene.sph_pos
    is_light = col(scene.is_light[sg].astype(f32))
    ones_s = jnp.ones((S, 1), f32)
    sph_rows = jnp.concatenate([
        col(scene.color[sg]), col(scene.shine[sg]), col(scene.specular[sg]),
        col(scene.mirror[sg]), 2.0 * is_light + 1.0, zeros(S, 1),
        col(pos), col(pos),                            # center; normal slot = center
        col(jnp.sum(pos * pos, axis=-1)), col(scene.sph_r * scene.sph_r),
        zeros(S, 19),                                  # tri coefficients
        ones_s, 1.0 - is_light,
        col(sg.astype(f32)), zeros(S, N_CHANNELS - C_GIDX - 1),
    ], axis=1)

    pl_row = jnp.concatenate([
        col(scene.color[0:1]), col(scene.shine[0:1]), col(scene.specular[0:1]),
        col(scene.mirror[0:1]), zeros(1, 2),
        zeros(1, 3), col(scene.plane_normal[None, :]),
        zeros(1, 21),
        jnp.ones((1, 2), f32),                         # valid, blocks
        zeros(1, N_CHANNELS - C_GIDX),                 # gidx = 0
    ], axis=1)

    # padding rows: gidx 1e9 (never wins ties) and r² = −1 (< any d² the
    # sphere accept's −0.01 quirk window can produce, so a zero-radius row
    # at the origin can NEVER phantom-hit rays grazing the world origin;
    # triangle sweeps ignore C_R2 and reject the all-zero coefficients)
    pad_row = (jnp.zeros((1, N_CHANNELS), f32)
               .at[0, C_GIDX].set(1e9).at[0, C_R2].set(-1.0))
    counts = list(tri_clusters) if tri_clusters else [T]
    parts = [pl_row]
    off = 0
    for cnt, pad in zip(counts, pads):
        parts.append(tri_rows[off:off + cnt])
        if pad > cnt:
            parts.append(jnp.broadcast_to(pad_row, (pad - cnt, N_CHANNELS)))
        off += cnt
    off = 0
    for cnt, pad in zip(s_counts, s_pads):
        parts.append(sph_rows[off:off + cnt])
        if pad > cnt:
            parts.append(jnp.broadcast_to(pad_row, (pad - cnt, N_CHANNELS)))
        off += cnt
    tail = n_pad - 1 - t_pad - s_pad
    if tail:
        parts.append(jnp.broadcast_to(pad_row, (tail, N_CHANNELS)))
    rows = jnp.concatenate(parts, axis=0)
    return rows[:, None, :]          # (N_OBJ_PAD, 1, N_CHANNELS)


def cluster_bounds(scene: Scene, tri_clusters=None, sph_clusters=None,
                   t_subs=None):
    """Bounding sphere (cx, cy, cz, r) per cull bound → (K_sub + K_sph, 4).

    Conservative: AABB center of the cluster's vertices (or sphere
    centers), radius to the farthest vertex / sphere surface plus a small
    epsilon for float slack. Runs per frame inside jit — sphere clusters
    containing the orbiting sun/moon proxies get fresh bounds each frame.
    t_subs refines triangle clusters into several sub-bounds each (see
    tri_sub_partition).
    """
    counts = list(tri_sub_partition(tri_clusters, t_subs)) \
        if tri_clusters else [scene.n_triangles]
    v0 = scene.tri_v0
    v1 = v0 + scene.tri_e1
    v2 = v0 + scene.tri_e2
    out = []
    off = 0
    for cnt in counts:
        vs = jnp.concatenate([v0[off:off + cnt], v1[off:off + cnt],
                              v2[off:off + cnt]], axis=0)
        lo = jnp.min(vs, axis=0)
        hi = jnp.max(vs, axis=0)
        c = (lo + hi) * 0.5
        r = jnp.sqrt(jnp.max(jnp.sum((vs - c) ** 2, axis=-1))) * 1.001 + 0.01
        out.append(jnp.concatenate([c, r[None]]))
        off += cnt
    s_counts, _, _ = sph_cluster_norm(scene.n_spheres, sph_clusters)
    off = 0
    for cnt in s_counts:
        p = scene.sph_pos[off:off + cnt]
        sr = scene.sph_r[off:off + cnt]
        lo = jnp.min(p, axis=0)
        hi = jnp.max(p, axis=0)
        c = (lo + hi) * 0.5
        r = (jnp.max(jnp.sqrt(jnp.sum((p - c) ** 2, axis=-1)) + sr)
             * 1.001 + 0.01)
        out.append(jnp.concatenate([c, r[None]]))
        off += cnt
    return jnp.stack(out)


def pack_params(cam_rays, lights: Lights, ambient, sea_y, row0=0):
    p = jnp.zeros((N_PARAMS,), f32)
    segs = [
        (P_CAMPOS, cam_rays.pos), (P_LD, cam_rays.LD), (P_RD, cam_rays.RD),
        (P_LU, cam_rays.LU), (P_RU, cam_rays.RU),
        (P_LPOS0, lights.pos[0]), (P_LPOS1, lights.pos[1]),
        (P_LCOL0, lights.color[0]), (P_LCOL1, lights.color[1]),
        (P_LINT, lights.intensity), (P_AMBIENT, jnp.asarray(ambient, f32)),
        (P_SEAY, jnp.asarray(sea_y, f32)[None]),
        (P_ROW0, jnp.asarray(row0, f32)[None]),
    ]
    for off, v in segs:
        p = jax.lax.dynamic_update_slice(p, jnp.asarray(v, f32).reshape(-1), (off,))
    return p


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _vec3(C, c):
    """Channel triple from the coef tensor → three (N, 1, 1) object columns."""
    return C[:, :, c:c + 1], C[:, :, c + 1:c + 2], C[:, :, c + 2:c + 3]


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _norm3(x, y, z):
    # guarded: zero vectors (masked-out lanes in skip branches) stay finite
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _ge0(x):
    # f32 {0,1} masks combined by multiplication: Mosaic cannot lower
    # boolean-algebra ops on 3D tensors (i8->i1 truncation unsupported)
    return jnp.where(x >= 0, 1.0, 0.0)


def _tri_t(Ct, ox, oy, oz, dx, dy, dz, mx, my, mz):
    """Triangle sweep → t (T_PAD, TH, TW), BIG where miss.

    Det-scaled Möller-Trumbore linear forms (ops.linear_forms docstring);
    epsilons per kernel.cu:95-126. Padding rows have all-zero coefficients
    → det = 0 → rejected by the det >= 0.001 cull.
    """
    cdx, cdy, cdz = _vec3(Ct, C_CDET)
    aux, auy, auz = _vec3(Ct, C_AU)
    bux, buy, buz = _vec3(Ct, C_BU)
    avx, avy, avz = _vec3(Ct, C_AV)
    bvx, bvy, bvz = _vec3(Ct, C_BV)
    nx, ny, nz = _vec3(Ct, C_N)
    det = _dot3(dx, dy, dz, cdx, cdy, cdz)
    u_det = _dot3(dx, dy, dz, aux, auy, auz) + _dot3(mx, my, mz, bux, buy, buz)
    v_det = _dot3(dx, dy, dz, avx, avy, avz) - _dot3(mx, my, mz, bvx, bvy, bvz)
    t_det = _dot3(ox, oy, oz, nx, ny, nz) - Ct[:, :, C_V0N:C_V0N + 1]
    # accept ⟺ min(det-0.001, u·det, v·det, det-u·det-v·det, t·det) ≥ 0 —
    # one compare instead of five (all tests share the same strictness)
    acc = jnp.minimum(jnp.minimum(det - 0.001, t_det),
                      jnp.minimum(jnp.minimum(u_det, v_det),
                                  det - u_det - v_det))
    hit = acc >= 0
    t = t_det / jnp.where(hit, det, 1.0)
    return jnp.where(hit, t, BIG)


def _sph_t(Cs, ox, oy, oz, dx, dy, dz):
    """Sphere sweep → t (S_PAD, TH, TW), BIG where miss (kernel.cu:47-69).

    Padding rows carry r² = −1 (pack_scene) so the accept is
    unsatisfiable. r² = 0 is NOT safe: pad rows sit at the origin, and
    f32 rounding can drive d² a hair negative — inside the reference's
    −0.01 quirk window — phantom-hitting rays that graze (0,0,0)
    (pinned by test_sphere_padding_rows_unhittable).
    """
    px, py, pz = _vec3(Cs, C_CENTER)
    od = _dot3(ox, oy, oz, dx, dy, dz)
    oo = _dot3(ox, oy, oz, ox, oy, oz)
    tca = _dot3(dx, dy, dz, px, py, pz) - od
    ll = Cs[:, :, C_POS2:C_POS2 + 1] - 2.0 * _dot3(ox, oy, oz, px, py, pz) + oo
    d2 = ll - tca * tca
    r2 = Cs[:, :, C_R2:C_R2 + 1]
    # accept ⟺ min(tca, r²-d², d²+0.01) > 0 (all strict)
    acc = jnp.minimum(tca, jnp.minimum(r2 - d2, d2 + 0.01))
    t = tca - jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    return jnp.where(acc > 0, t, BIG)


def _plane_t(oy, dy, sea_y):
    """Sea-plane t (TH, TW), BIG where miss (kernel.cu:71-94)."""
    t = (sea_y - oy) / dy
    hit = (dy * dy > 0.00001) & (t >= 0)      # 2D op — bools are fine here
    return jnp.where(hit, t, BIG)


def _ival_prod(alo, ahi, blo, bhi):
    """Interval product [alo,ahi]x[blo,bhi] → (lo, hi) (scalars)."""
    p1, p2, p3, p4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
    lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    return lo, hi


def _cluster_possible(cx, cy, cz, r, obox, dbox, t_hi=None):
    """Sound per-tile cull: can ANY ray with origin in obox and direction
    in dbox intersect the bounding sphere (c, r)?

    Interval arithmetic over the geometric sphere test: possible iff the
    origin box may touch the sphere, or the sphere may lie ahead
    (tca_hi > 0) with squared miss distance possibly below r². Ignoring the
    correlation between |L|² and tca only widens the answer (conservative).

    t_hi (optional scalar): an upper bound on the t any lane in the tile
    still cares about (best-known hit for primary sweeps, farthest needed
    light for shadow sweeps). Every accepted sphere-bound hit has
    t ≥ tca − r ≥ tlo − r, so a cluster wholly beyond t_hi can't win
    (directions are unit vectors, so t is Euclidean distance).
    """
    (oxlo, oxhi, oylo, oyhi, ozlo, ozhi) = obox
    (dxlo, dxhi, dylo, dyhi, dzlo, dzhi) = dbox
    lxlo, lxhi = cx - oxhi, cx - oxlo
    lylo, lyhi = cy - oyhi, cy - oylo
    lzlo, lzhi = cz - ozhi, cz - ozlo

    tlo = thi = None
    ll_lo = jnp.float32(0.0)
    for llo, lhi, dlo, dhi in ((lxlo, lxhi, dxlo, dxhi),
                               (lylo, lyhi, dylo, dyhi),
                               (lzlo, lzhi, dzlo, dzhi)):
        plo, phi = _ival_prod(llo, lhi, dlo, dhi)
        tlo = plo if tlo is None else tlo + plo
        thi = phi if thi is None else thi + phi
        comp_min = jnp.where((llo < 0) & (lhi > 0), 0.0,
                             jnp.minimum(llo * llo, lhi * lhi))
        ll_lo = ll_lo + comp_min

    r2 = r * r
    tca2_hi = jnp.maximum(tlo * tlo, thi * thi)
    d2_lo = ll_lo - tca2_hi
    inside = ll_lo <= r2
    ahead = (thi > 0) & (d2_lo <= r2)
    if t_hi is not None:
        ahead = ahead & (tlo - r <= t_hi)
    return inside | ahead


def _box(x):
    return jnp.min(x), jnp.max(x)


ATTR_CHANNELS = (C_COL, C_COL + 1, C_COL + 2, C_SHINE, C_SPEC, C_KR,
                 C_FLAGS, C_NORMAL, C_NORMAL + 1, C_NORMAL + 2)


def _local_reduce(Cg, t_g):
    """Reduce one object group's sweep to its local winner.

    Returns (t_min, win_gidx, attrs[10]) — all (TH, TW). Cross-group combine
    is then a handful of 2D selects; groups that were culled contribute
    (BIG, 1e9, zeros) and never win. Lowest-gidx tie-break within the group
    matches the reference's strict-'<' scan (kernel.cu:144-151)."""
    g = Cg[:, :, C_GIDX:C_GIDX + 1]
    t_min = jnp.min(t_g, axis=0)
    win_g = jnp.min(jnp.where(t_g == t_min[None], g, f32(1e9)), axis=0)
    oh = (jnp.where(g == win_g[None], 1.0, 0.0)
          * jnp.where(t_g < BIG * 0.5, 1.0, 0.0))
    attrs = [jnp.sum(oh * Cg[:, :, c:c + 1], axis=0) for c in ATTR_CHANNELS]
    return (t_min, win_g, *attrs)


def _tri_occ_partial(Ctk, ox, oy, oz, dx, dy, dz, mx, my, mz, max_dist):
    """Shadow partial from one triangle cluster → f32 {0,1} (TH, TW)."""
    t = _tri_t(Ctk, ox, oy, oz, dx, dy, dz, mx, my, mz)
    return jnp.where(jnp.min(t, axis=0) < max_dist, 1.0, 0.0)


def _sph_occ_partial(Csk, ox, oy, oz, dx, dy, dz, max_dist):
    """Shadow partial from one sphere cluster → f32 {0,1} (TH, TW).

    Emissive spheres never occlude (kernel.cu:188-193): masked by the
    per-row C_BLOCKS channel."""
    blocks = Csk[:, :, C_BLOCKS:C_BLOCKS + 1]
    t_sph = jnp.where(blocks > 0, _sph_t(Csk, ox, oy, oz, dx, dy, dz), BIG)
    return jnp.where(jnp.min(t_sph, axis=0) < max_dist, 1.0, 0.0)


def _make_kernel(H, W, TH, TW, t_pads, s_pads, s_occl, total_h=None,
                 total_w=None, t_bound=True, lane_split=1, t_subs=None,
                 ablate=()):
    # `ablate`: static DIAGNOSTIC arms for cost decomposition
    # (experiments/megakernel_ablation.py) — never used by render paths.
    # "noshadow" = skip all occlusion sweeps (lights never blocked),
    # "noshade"  = skip the shading/bounce epilogue entirely,
    # "nocull"   = disable the interval culls (sweep every cluster),
    # "depthN"   = cap the bounce depth at N (depth0 = primaries only),
    # "hcull"    = force the below-horizon light cull ON (A/B arm),
    # "nohcull"  = force it OFF (decomposition arm once the default flips),
    # "specgate" = force the per-light specular gate ON (A/B arm),
    # "nospecgate" = force it OFF.
    # ablate=() compiles the exact shipped kernel.
    maxd = MAX_DEPTH
    for a in ablate:
        if a.startswith("depth"):
            maxd = int(a[5:])
    hcull = "hcull" in ablate or (
        HCULL_DEFAULT and "nocull" not in ablate and "nohcull" not in ablate)
    # excluded under noshadow (the gate's proof needs occlusion active) and
    # noshade (the spec tensors would be dead weight beside a skipped
    # epilogue); an explicit "specgate" arm overrides, diagnostics-at-risk
    specgate = "specgate" in ablate or (
        SPECGATE_DEFAULT and not any(a in ablate for a in (
            "nospecgate", "nocull", "noshadow", "noshade")))
    def kernel(params_ref, coef_ref,
               r_ref, g_ref, b_ref, mw_ref, mdx_ref, mdy_ref, mdz_ref):
        # grid = (frames, row tiles, col tiles); the frame dimension batches
        # whole frames into one launch (per-frame params/coef arrive via the
        # BlockSpec index maps), amortizing fixed per-dispatch costs
        f = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)

        class _P:   # scalar reads from this frame's row of the SMEM params
            def __getitem__(self, idx):
                return params_ref[f, idx]

        P = _P()
        C = coef_ref[0]                      # (N_OBJ_PAD, 1, N_CHANNELS)
        Ct_list = []                         # per-cluster triangle row slices
        off = 1
        for pad in t_pads:
            Ct_list.append(C[off:off + pad])
            off += pad
        Cs_list = []                         # per-cluster sphere row slices
        for pad in s_pads:
            Cs_list.append(C[off:off + pad])
            off += pad
        Cp = C[0:1, 0, :]                    # sea plane row, (1, N_CHANNELS)
        sea_y = P[P_SEAY]

        def cluster_bound(kk):
            b = P_CLUSTERS + 4 * kk
            return P[b], P[b + 1], P[b + 2], P[b + 3]

        # triangle cull bounds may be refined: sweep cluster kk's cull is
        # the OR of its t_subs[kk] sub-bound tests (tighter spheres — e.g.
        # per-mountain bounds under a pair-wide sweep); sphere cluster
        # bounds follow the tri sub-bounds in the params vector
        subs = tuple(t_subs) if t_subs else (1,) * len(t_pads)
        sub_off = [0]
        for m in subs:
            sub_off.append(sub_off[-1] + m)
        n_tri_bounds = sub_off[-1]

        def tri_possible(kk, obox, dbox, t_hi):
            poss = None
            for u in range(sub_off[kk], sub_off[kk + 1]):
                p = _cluster_possible(*cluster_bound(u), obox, dbox, t_hi)
                poss = p if poss is None else (poss | p)
            return poss

        # --- primary rays (kernel.cu:244-253); P_ROW0/total_h address a band
        # of a larger framebuffer so multi-chip shards reproduce the exact
        # single-chip rays (row0 is a dynamic SMEM scalar: one compiled
        # kernel serves every band; f32 add of small ints is exact) ---
        th_total = H if total_h is None else total_h
        tw_total = W if total_w is None else total_w
        row = P[P_ROW0] + (
            i * TH
            + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)).astype(f32)
        col = (j * TW + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)).astype(f32)
        px = col * (1.0 / (tw_total - 1))
        py = row * (1.0 / (th_total - 1))

        def corner(base):
            return P[base], P[base + 1], P[base + 2]

        ldx, ldy, ldz = corner(P_LD)
        rdx, rdy, rdz = corner(P_RD)
        lux, luy, luz = corner(P_LU)
        rux, ruy, ruz = corner(P_RU)
        vdx = ldx + (rdx - ldx) * px
        vdy = ldy + (rdy - ldy) * px
        vdz = ldz + (rdz - ldz) * px
        vux = lux + (rux - lux) * px
        vuy = luy + (ruy - luy) * px
        vuz = luz + (ruz - luz) * px
        dx, dy, dz = _norm3(vux - (vux - vdx) * py,
                            vuy - (vuy - vdy) * py,
                            vuz - (vuz - vdz) * py)
        ox = jnp.full((TH, TW), P[P_CAMPOS], f32)
        oy = jnp.full((TH, TW), P[P_CAMPOS + 1], f32)
        oz = jnp.full((TH, TW), P[P_CAMPOS + 2], f32)

        zeros = jnp.zeros((TH, TW), f32)
        carry = (ox, oy, oz, dx, dy, dz,
                 jnp.ones((TH, TW), f32),            # throughput
                 zeros, zeros, zeros,                # rgb acc
                 jnp.ones((TH, TW), f32),            # live mask (f32: Mosaic
                 zeros,                              # rejects i1 loop carries)
                 dx, dy, dz)                         # miss dir

        ambx, amby, ambz = P[P_AMBIENT], P[P_AMBIENT + 1], P[P_AMBIENT + 2]

        def step(carry):
            """One bounce level, flattened into SIBLING lax.conds (Mosaic
            cannot legalize nested scf.if). Each triangle AND sphere cluster
            runs sweep + local winner reduce inside its own cond, gated on
            tile liveness AND a sound bounding-sphere interval cull; the
            cross-group combine is a few 2D selects and runs
            unconditionally. Shadows repeat the pattern per light (emissive-
            only sphere clusters are statically excluded from occlusion).
            This recovers the reference's sequential early-outs
            (kernel.cu:192, 222) at tile granularity plus spatial culling it
            never had."""
            (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba, live,
             mw, mdx, mdy, mdz) = carry

            mx = oy * dz - oz * dy          # m = o×d
            my = oz * dx - ox * dz
            mz = ox * dy - oy * dx

            # lane-split culling: predicates, liveness reduces and sweeps
            # run per TWB-lane band (TWB = TW // lane_split; 128-lane bands
            # keep slices register-aligned). The combine is lanewise, so
            # banding + concat is bit-identical to the full-tile form; the
            # per-band ray boxes and t-bounds are strictly tighter, and a
            # cluster touching only one band no longer sweeps the other.
            TWB = TW // lane_split
            bsl = lambda x, s: x[:, s * TWB:(s + 1) * TWB] \
                if lane_split > 1 else x

            def group_skip(args):
                z = jnp.zeros((TH, TWB), f32)
                return (jnp.full((TH, TWB), BIG, f32),
                        jnp.full((TH, TWB), 1e9, f32)) + (z,) * 10

            # sea plane candidate FIRST (cheap 2D math, unconditional): its
            # max t over live lanes bounds every cluster cull below — a
            # ground/sea tile whose every lane already hits the plane at
            # t≈20 skips the mountain ring 300+ units out entirely. One
            # reduce per band, shared by all of its conds (a per-cluster
            # chained reduce measured −9%: see docs/PERFORMANCE.md
            # "shadow-cluster early exit"). Dead lanes contribute 0; a live
            # lane that misses the plane contributes BIG and disables the
            # bound for its band.
            t_pl = _plane_t(oy, dy, sea_y)
            pl_hit = jnp.where(t_pl < BIG * 0.5, 1.0, 0.0)
            pl_attrs = tuple(pl_hit * Cp[0, c] for c in ATTR_CHANNELS)

            band_combined = []
            for s in range(lane_split):
                oxs, oys, ozs = bsl(ox, s), bsl(oy, s), bsl(oz, s)
                dxs, dys, dzs = bsl(dx, s), bsl(dy, s), bsl(dz, s)
                lives = bsl(live, s)
                any_live = jnp.max(lives) > 0
                obox = _box(oxs) + _box(oys) + _box(ozs)
                dbox = _box(dxs) + _box(dys) + _box(dzs)
                t_pls = bsl(t_pl, s)
                t_hi = jnp.max(lives * t_pls) if t_bound else None
                ray_args = (oxs, oys, ozs, dxs, dys, dzs,
                            bsl(mx, s), bsl(my, s), bsl(mz, s))
                candidates = [(t_pls, jnp.where(bsl(pl_hit, s) > 0, 0.0, 1e9))
                              + tuple(bsl(a, s) for a in pl_attrs)]
                for kk, Ctk in enumerate(Ct_list):
                    poss = tri_possible(kk, obox, dbox, t_hi)

                    def sweep_k(args, Ctk=Ctk):
                        ox, oy, oz, dx, dy, dz, mx, my, mz = args
                        t_k = _tri_t(Ctk, ox[None], oy[None], oz[None],
                                     dx[None], dy[None], dz[None],
                                     mx[None], my[None], mz[None])
                        return _local_reduce(Ctk, t_k)

                    pred = any_live if "nocull" in ablate \
                        else (any_live & poss)
                    candidates.append(jax.lax.cond(
                        pred, sweep_k, group_skip, ray_args))

                for kk, Csk in enumerate(Cs_list):
                    poss = _cluster_possible(
                        *cluster_bound(n_tri_bounds + kk), obox, dbox, t_hi)

                    def sweep_s(args, Csk=Csk):
                        ox, oy, oz, dx, dy, dz, mx, my, mz = args
                        t_s = _sph_t(Csk, ox[None], oy[None], oz[None],
                                     dx[None], dy[None], dz[None])
                        return _local_reduce(Csk, t_s)

                    pred = any_live if "nocull" in ablate \
                        else (any_live & poss)
                    candidates.append(jax.lax.cond(
                        pred, sweep_s, group_skip, ray_args))

                # --- cross-group combine: lexicographic (t, gidx) winner ---
                t_min = candidates[0][0]
                for cand in candidates[1:]:
                    t_min = jnp.minimum(t_min, cand[0])
                win_g = jnp.full((TH, TWB), 1e9, f32)
                for cand in candidates:
                    win_g = jnp.minimum(
                        win_g, jnp.where(cand[0] == t_min, cand[1], f32(1e9)))
                picked = [jnp.zeros((TH, TWB), f32) for _ in ATTR_CHANNELS]
                for cand in candidates:
                    sel = jnp.where((cand[0] == t_min) & (cand[1] == win_g),
                                    1.0, 0.0)
                    picked = [p + sel * a for p, a in zip(picked, cand[2:])]
                band_combined.append([t_min] + picked)

            if lane_split > 1:
                t_min, *picked = (
                    jnp.concatenate(parts, axis=1)
                    for parts in zip(*band_combined))
            else:
                (t_min, *picked), = band_combined
            (colr, colg, colb, shine, spec_e, kr, flags,
             nvx, nvy, nvz) = picked
            hit_f = jnp.where(t_min < BIG * 0.5, 1.0, 0.0)
            t_pos = t_min * hit_f            # t clamped to 0 on miss

            # --- miss → deferred sky ---
            miss = live * (1.0 - hit_f) > 0
            mw = jnp.where(miss, thr, mw)
            mdx = jnp.where(miss, dx, mdx)
            mdy = jnp.where(miss, dy, mdy)
            mdz = jnp.where(miss, dz, mdz)

            hx = ox + dx * t_pos
            hy = oy + dy * t_pos
            hz = oz + dz * t_pos
            # flags = islight*2 + issph; the normal-slot vec3 is the static
            # normal for tris/plane and the CENTER for spheres
            em_f = jnp.where(flags >= 2.0, 1.0, 0.0)
            is_sph = (flags - 2.0 * em_f) > 0
            sphnx, sphny, sphnz = _norm3(hx - nvx, hy - nvy, hz - nvz)
            nx = jnp.where(is_sph, sphnx, nvx)
            ny = jnp.where(is_sph, sphny, nvy)
            nz = jnp.where(is_sph, sphnz, nvz)
            shaded_f = live * hit_f * (1.0 - em_f)

            # per-light geometry stays unconditional (the shadow `need`
            # masks want the angles); shadowed angles collected per light.
            # Occlusion sweeps run per lane band, like the primary sweeps.
            zero2d = lambda a: jnp.zeros((TH, TWB), f32)
            angles = []
            sdirs = []
            spec_kill = []
            for li in range(2):
                base = P_LPOS0 if li == 0 else P_LPOS1
                lvx = P[base] - hx
                lvy = P[base + 1] - hy
                lvz = P[base + 2] - hz
                sdist = jnp.sqrt(lvx * lvx + lvy * lvy + lvz * lvz)
                inv = 1.0 / sdist
                sdx, sdy, sdz = lvx * inv, lvy * inv, lvz * inv
                angle = jnp.maximum(0.0, nx * sdx + ny * sdy + nz * sdz)
                need = shaded_f * jnp.where(angle > 0, 1.0, 0.0)

                sox, soy, soz = (hx + sdx * 0.001, hy + sdy * 0.001,
                                 hz + sdz * 0.001)
                smx = soy * sdz - soz * sdy
                smy = soz * sdx - sox * sdz
                smz = sox * sdy - soy * sdx

                if specgate:
                    # tile-wide hcull conditions (a band-agnostic superset
                    # of the per-band plane_kill): under them every needy
                    # lane's occ_pl term fires regardless of hcull/bands,
                    # so this light's post-occlusion angle — and with it
                    # its specular — is exactly 0 on every shaded lane.
                    # NaN sdy poisons the min and vetoes — conservative.
                    min_hy_t = jnp.min(jnp.where(need > 0, hy, f32(BIG)))
                    min_msdy_t = jnp.min(jnp.where(need > 0, -sdy, f32(BIG)))
                    spec_kill.append((P[base + 1] < sea_y)
                                     & (min_hy_t > sea_y + 0.001)
                                     & (min_msdy_t > 0.0032))

                occ_bands = []
                for s in range(lane_split):
                    needs = bsl(need, s)
                    any_need = jnp.max(needs) > 0
                    hbox = (_box(bsl(hx, s)) + _box(bsl(hy, s))
                            + _box(bsl(hz, s)))
                    sdxs, sdys, sdzs = bsl(sdx, s), bsl(sdy, s), bsl(sdz, s)
                    sdbox = _box(sdxs) + _box(sdys) + _box(sdzs)
                    sdists = bsl(sdist, s)
                    shadow_args = (bsl(sox, s), bsl(soy, s), bsl(soz, s),
                                   sdxs, sdys, sdzs,
                                   bsl(smx, s), bsl(smy, s), bsl(smz, s),
                                   sdists)
                    # occluders matter only at t < the lane's light
                    # distance; one reduce over the band's lanes that still
                    # need this light bounds every shadow-cluster cull.
                    # +0.001: hbox/tlo come from the hit points hx, but the
                    # occlusion rays originate at sox = hx + 0.001*sdir, so
                    # a cluster's true nearest t can undercut tlo by up to
                    # 0.001 — the slack keeps the cull provably conservative
                    # (cluster_bounds' +0.01 radius slack covered this in
                    # practice; this makes it explicit)
                    t_hi_s = (jnp.max(needs * sdists) + 0.001
                              if t_bound else None)
                    # Below-horizon light cull ("hcull"): moon = −sun
                    # (state.py:129, y-offset 0), so on almost every frame
                    # exactly one light sits strictly below the sea plane.
                    # If additionally every lane that still needs this light
                    # (a) hit strictly above the plane — hy > sea_y + 0.001,
                    #     so the occlusion-ray origin soy = hy + 0.001·sdy
                    #     stays above sea_y for any unit sdy — and
                    # (b) points at the light steeply enough that _plane_t's
                    #     dy² > 1e-5 accept test fires (−sdy > 0.0032 >
                    #     √1e-5; sdy < 0 follows from light_y < sea_y < hy),
                    # then each such ray crosses the plane at
                    # t = (sea_y − soy)/sdy with 0 < t < sdist − 0.001
                    # (light_y = soy + (sdist − 0.001)·sdy < sea_y rearranges
                    # to exactly that) — i.e. the occ_pl term alone occludes
                    # every needed lane, and occ := needs reproduces the full
                    # computation's effect on every lane the shading reads
                    # (occ on need==0 lanes is downstream-irrelevant, the
                    # same contract the shipped any_need gate already uses).
                    # Three scalar reduces replace every occlusion sweep for
                    # the dead light. NaN sdy (degenerate sdist) poisons the
                    # min and vetoes — conservative.
                    if hcull:
                        min_hy = jnp.min(
                            jnp.where(needs > 0, bsl(hy, s), f32(BIG)))
                        min_msdy = jnp.min(
                            jnp.where(needs > 0, -sdys, f32(BIG)))
                        plane_kill = ((P[base + 1] < sea_y)
                                      & (min_hy > sea_y + 0.001)
                                      & (min_msdy > 0.0032))
                        any_need = any_need & jnp.logical_not(plane_kill)
                    occ_f = jnp.zeros((TH, TWB), f32)
                    for kk, Ctk in enumerate(Ct_list):
                        if "noshadow" in ablate:
                            break
                        poss = tri_possible(kk, hbox, sdbox, t_hi_s)
                        pred = any_need if "nocull" in ablate \
                            else (any_need & poss)

                        def occ_k(args, Ctk=Ctk):
                            (sox, soy, soz, sdx, sdy, sdz,
                             smx, smy, smz, sdist) = args
                            return _tri_occ_partial(
                                Ctk, sox[None], soy[None], soz[None],
                                sdx[None], sdy[None], sdz[None],
                                smx[None], smy[None], smz[None], sdist)

                        occ_f = occ_f + jax.lax.cond(
                            pred, occ_k, zero2d, shadow_args)

                    for kk, Csk in enumerate(Cs_list):
                        if "noshadow" in ablate:
                            break
                        if not s_occl[kk]:
                            continue    # emissive-only cluster (sun/moon
                        #                 proxies): statically shadow-inert
                        poss = _cluster_possible(
                            *cluster_bound(n_tri_bounds + kk), hbox, sdbox,
                            t_hi_s)
                        pred = any_need if "nocull" in ablate \
                            else (any_need & poss)

                        def occ_s(args, Csk=Csk):
                            (sox, soy, soz, sdx, sdy, sdz,
                             smx, smy, smz, sdist) = args
                            return _sph_occ_partial(
                                Csk, sox[None], soy[None], soz[None],
                                sdx[None], sdy[None], sdz[None], sdist)

                        occ_f = occ_f + jax.lax.cond(
                            pred, occ_s, zero2d, shadow_args)

                    def occ_pl(args):
                        soy, sdy, sdist = args
                        return jnp.where(_plane_t(soy, sdy, sea_y) < sdist,
                                         1.0, 0.0)

                    if "noshadow" not in ablate:
                        occ_f = occ_f + jax.lax.cond(
                            any_need, occ_pl, zero2d,
                            (bsl(soy, s), bsl(sdy, s), sdists))
                    if hcull:    # plane-kill: the plane occludes all needed
                        occ_f = occ_f + jnp.where(
                            plane_kill, f32(1.0), f32(0.0)) * needs
                    occ_bands.append(occ_f)

                occ_f = (jnp.concatenate(occ_bands, axis=1)
                         if lane_split > 1 else occ_bands[0])
                angles.append(jnp.where(occ_f > 0, 0.0, angle))
                sdirs.append((sdx, sdy, sdz))

            if specgate:
                # Per-light specular tensors as SIBLING conds (shade_fn runs
                # under a cond and Mosaic rejects nested scf.if). Skipped
                # when no shaded lane is shiny or when spec_kill proves the
                # light plane-occluded tile-wide; the computed branch is the
                # exact expression chain shade_fn used inline, op for op.
                any_shaded = jnp.max(shaded_f) > 0
                any_shine = jnp.max(
                    jnp.where(shaded_f > 0, shine, f32(0.0))) > 0
                zero_full = lambda a: jnp.zeros((TH, TW), f32)
                spec_pre = []
                for li in range(2):
                    sargs = (angles[li], *sdirs[li], nx, ny, nz,
                             dx, dy, dz, shine, spec_e)

                    def spec_fn(args):
                        (angle, sdx, sdy, sdz, nx, ny, nz,
                         dx, dy, dz, shine, spec_e) = args
                        ldn = -(sdx * nx + sdy * ny + sdz * nz)
                        spx, spy, spz = _norm3(-sdx - 2.0 * ldn * nx,
                                               -sdy - 2.0 * ldn * ny,
                                               -sdz - 2.0 * ldn * nz)
                        sbase = jnp.maximum(
                            0.0, -(spx * dx + spy * dy + spz * dz))
                        spec_pow = jnp.where(
                            sbase > 0,
                            jnp.exp2(spec_e * jnp.log2(
                                jnp.maximum(sbase, 1e-30))),
                            jnp.where(spec_e > 0, 0.0, 1.0))
                        return jnp.where(
                            shine > 0, spec_pow * shine * angle, 0.0)

                    pred = (any_shaded & any_shine
                            & jnp.logical_not(spec_kill[li]))
                    spec_pre.append(
                        jax.lax.cond(pred, spec_fn, zero_full, sargs))

            def shade_fn(args):
                """Emissive add + Phong diffuse/specular + mirror step
                (kernel.cu:169-218) — the transcendental-heavy tail, run only
                when some lane in the tile actually hit something."""
                if specgate:
                    (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba,
                     hx, hy, hz, nx, ny, nz, colr, colg, colb,
                     shine, spec_e, kr, em_f, shaded_f, hit_f, live,
                     a0, a1, s0x, s0y, s0z, s1x, s1y, s1z, sp0, sp1) = args
                else:
                    (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba,
                     hx, hy, hz, nx, ny, nz, colr, colg, colb,
                     shine, spec_e, kr, em_f, shaded_f, hit_f, live,
                     a0, a1, s0x, s0y, s0z, s1x, s1y, s1z) = args

                lit = live * hit_f * em_f > 0
                ra = ra + jnp.where(lit, thr * colr, 0.0)
                ga = ga + jnp.where(lit, thr * colg, 0.0)
                ba = ba + jnp.where(lit, thr * colb, 0.0)

                shaded = shaded_f > 0
                phr = colr * ambx
                phg = colg * amby
                phb = colb * ambz
                for li, (angle, (sdx, sdy, sdz)) in enumerate(
                        zip((a0, a1), ((s0x, s0y, s0z), (s1x, s1y, s1z)))):
                    cbase = P_LCOL0 if li == 0 else P_LCOL1
                    aint = angle * P[P_LINT + li]
                    phr = phr + colr * P[cbase] * aint
                    phg = phg + colg * P[cbase + 1] * aint
                    phb = phb + colb * P[cbase + 2] * aint

                    # Phong specular (kernel.cu:198-205): reflect -sdir.
                    # Under specgate the tensor arrives precomputed from the
                    # sibling cond (identical chain, or exact zeros when the
                    # gate proved it zero on every shaded lane).
                    if specgate:
                        spec = (sp0, sp1)[li]
                    else:
                        ldn = -(sdx * nx + sdy * ny + sdz * nz)
                        spx, spy, spz = _norm3(-sdx - 2.0 * ldn * nx,
                                               -sdy - 2.0 * ldn * ny,
                                               -sdz - 2.0 * ldn * nz)
                        sbase = jnp.maximum(
                            0.0, -(spx * dx + spy * dy + spz * dz))
                        # exp2(e·log2(s)) == power(s, e) for s > 0; at s == 0
                        # the clamp would yield 2^(−99.66·e) ≠ power(0, e) —
                        # match the oracle exactly: 0 for e > 0, 1 for e == 0
                        spec_pow = jnp.where(
                            sbase > 0,
                            jnp.exp2(spec_e * jnp.log2(
                                jnp.maximum(sbase, 1e-30))),
                            jnp.where(spec_e > 0, 0.0, 1.0))
                        spec = jnp.where(
                            shine > 0, spec_pow * shine * angle, 0.0)
                    phr = phr + spec
                    phg = phg + spec
                    phb = phb + spec

                w = jnp.where(shaded, thr * (1.0 - kr), 0.0)
                ra = ra + w * phr
                ga = ga + w * phg
                ba = ba + w * phb

                # --- mirror bounce (kernel.cu:209-218) ---
                ddn = dx * nx + dy * ny + dz * nz
                rx, ry, rz = _norm3(dx - 2.0 * ddn * nx,
                                    dy - 2.0 * ddn * ny,
                                    dz - 2.0 * ddn * nz)
                bounce_f = shaded_f * jnp.where(kr > 0, 1.0, 0.0)
                bounce_on = bounce_f > 0
                ox = jnp.where(bounce_on, hx + rx * 0.001, ox)
                oy = jnp.where(bounce_on, hy + ry * 0.001, oy)
                oz = jnp.where(bounce_on, hz + rz * 0.001, oz)
                dx = jnp.where(bounce_on, rx, dx)
                dy = jnp.where(bounce_on, ry, dy)
                dz = jnp.where(bounce_on, rz, dz)
                thr = jnp.where(bounce_on, thr * kr, thr)
                return (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba, bounce_f)

            def shade_skip(args):
                (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba) = args[:10]
                return (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba,
                        jnp.zeros((TH, TW), f32))

            shade_args = (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba,
                          hx, hy, hz, nx, ny, nz, colr, colg, colb,
                          shine, spec_e, kr, em_f, shaded_f, hit_f, live,
                          angles[0], angles[1], *sdirs[0], *sdirs[1]) + (
                          tuple(spec_pre) if specgate else ())
            if "noshade" in ablate:     # static: the shade branch vanishes
                (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba,
                 live) = shade_skip(shade_args)
            else:
                (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba,
                 live) = jax.lax.cond(jnp.max(live * hit_f) > 0,
                                      shade_fn, shade_skip, shade_args)
            return (ox, oy, oz, dx, dy, dz, thr, ra, ga, ba, live,
                    mw, mdx, mdy, mdz)

        # bounce loop as a while: a tile whose lanes are all dead (sky
        # tiles after level 0, most tiles after level 1 — only mirror
        # chains survive) exits immediately, skipping even the per-level
        # combine/shadow-geometry overhead a fori_loop would pay
        def loop_cond(state):
            k, carry = state
            return (k < maxd + 1) & (jnp.max(carry[10]) > 0)

        def loop_body(state):
            k, carry = state
            return k + 1, step(carry)

        _, carry = jax.lax.while_loop(loop_cond, loop_body,
                                      (jnp.int32(0), carry))

        (_, _, _, _, _, _, _, ra, ga, ba, _, mw, mdx, mdy, mdz) = carry
        r_ref[0] = ra
        g_ref[0] = ga
        b_ref[0] = ba
        mw_ref[0] = mw
        mdx_ref[0] = mdx
        mdy_ref[0] = mdy
        mdz_ref[0] = mdz

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "H", "W", "TH", "TW", "t_pads", "s_pads", "s_occl", "interpret",
    "total_h", "total_w", "t_bound", "lane_split", "t_subs", "ablate"))
def raytrace_planes_batch(coefs, params, H: int, W: int, t_pads: tuple,
                          s_pads: tuple, s_occl: tuple,
                          TH: int = DEFAULT_TILE_H, TW: int = DEFAULT_TILE_W,
                          interpret: bool = False,
                          total_h: int | None = None,
                          total_w: int | None = None,
                          t_bound: bool = DEFAULT_T_BOUND,
                          lane_split: int = DEFAULT_LANE_SPLIT,
                          t_subs: tuple | None = None, ablate: tuple = ()):
    """Render a BATCH of frames in one launch.

    coefs (K, N_OBJ_PAD, 1, C), params (K, N_PARAMS) → 7 planes of
    (K, H, W) f32. The grid's leading dimension walks frames; fixed
    per-dispatch costs amortize over K (scripted animation / benchmark
    batches — the latency-sensitive interactive path uses K=1)."""
    K = coefs.shape[0]
    grid = (K, pl.cdiv(H, TH), pl.cdiv(W, TW))
    out = jax.ShapeDtypeStruct((K, H, W), f32)
    tile = lambda f, i, j: (f, i, j)
    kernel = _make_kernel(H, W, TH, TW, t_pads, s_pads, s_occl, total_h,
                          total_w, t_bound, lane_split, t_subs, ablate)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # full (K, N_PARAMS) table in SMEM, indexed by program_id(0)
            # (a (1, N) block would violate the divisible-by-8 rule)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1,) + coefs.shape[1:], lambda f, i, j: (f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, TH, TW), tile, memory_space=pltpu.VMEM)
            for _ in range(7)),
        out_shape=(out,) * 7,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # grid steps are independent (frames x pixel tiles): lets Mosaic
            # overlap output DMA with the next tile's compute
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(params, coefs)


def raytrace_planes(coef, params, H: int, W: int, t_pads: tuple,
                    s_pads: tuple, s_occl: tuple,
                    TH: int = DEFAULT_TILE_H, TW: int = DEFAULT_TILE_W,
                    interpret: bool = False,
                    total_h: int | None = None,
                    total_w: int | None = None,
                    t_bound: bool = DEFAULT_T_BOUND,
                    lane_split: int = DEFAULT_LANE_SPLIT,
                    t_subs: tuple | None = None,
                    ablate: tuple = ()):
    """Single-frame megakernel run → 7 (H, W) f32 planes (K=1 batch)."""
    planes = raytrace_planes_batch(coef[None], params[None], H, W, t_pads,
                                   s_pads, s_occl, TH, TW, interpret,
                                   total_h, total_w, t_bound, lane_split,
                                   t_subs, ablate)
    return tuple(p[0] for p in planes)


def render_base_planes_pallas(scene: Scene, lights: Lights, ambient, cam_rays,
                              height: int, width: int,
                              tile_h: int | None = None,
                              tile_w: int | None = None,
                              interpret: bool = False,
                              tri_clusters: tuple | None = None,
                              sph_clusters: tuple | None = None,
                              row0=0, total_height: int | None = None,
                              t_bound: bool | None = None,
                              lane_split: int | None = None,
                              t_subs: tuple | None = None,
                              ablate: tuple = ()):
    """Scene → packed tensors → megakernel → 7 framebuffer planes.

    tri_clusters: optional static partition of the triangle list (contiguous
    counts, e.g. (16, 48, 12, 12, 12, 12) = island / trees / 4 mountain
    groups). sph_clusters: ((count, occludes), ...) partition of the sphere
    list (e.g. ((24, True), (2, False)) = scene spheres / emissive sun+moon
    proxies). Each cluster gets a bounding sphere and per-tile interval
    culling in the kernel; None treats the whole class as one cluster.
    row0 may be a traced scalar (it rides the SMEM params vector), so
    sharded bands share one compiled kernel.

    t_bound (default on): clusters wholly beyond the tile's worst-case
    needed t (sea-plane hit for primary sweeps, farthest needed light for
    shadows) are culled — measured −2.2% at 720p. lane_split: run culls +
    sweeps per TW/lane_split-lane band; bit-identical but measured −23%
    at 720p on the tunnel (relayout + cond overhead), kept at 1; re-test
    on dedicated silicon (docs/PERFORMANCE.md).

    tile_h/tile_w/t_bound/lane_split default to None = the autotuned knobs
    for the FULL frame size (launch_knobs; per-size autotune.json entries
    beat the flagship 720p winner) — sharded bands resolve by total_height
    so every band of a frame agrees."""
    knobs = launch_knobs(total_height if total_height is not None
                         else height, width)
    tile_h = knobs["tile_h"] if tile_h is None else tile_h
    tile_w = knobs["tile_w"] if tile_w is None else tile_w
    t_bound = knobs["t_bound"] if t_bound is None else t_bound
    lane_split = knobs["lane_split"] if lane_split is None else lane_split
    if t_subs and not tri_clusters:
        # silently accepting this would misalign the sphere-cluster bound
        # slots (_make_kernel counts sum(t_subs) tri bounds, but the packed
        # bounds would hold only the single whole-class tri bound)
        raise ValueError("t_subs requires tri_clusters")
    coef = pack_scene(scene, tri_clusters, sph_clusters)
    params = pack_params(cam_rays, lights, ambient, scene.plane_pos[1],
                         row0=row0)
    bounds = cluster_bounds(scene, tri_clusters, sph_clusters,
                            t_subs).reshape(-1)
    params = jax.lax.dynamic_update_slice(params, bounds, (P_CLUSTERS,))
    t_pads = tri_cluster_pads(scene.n_triangles, tri_clusters)
    _, s_pads, s_occl = sph_cluster_norm(scene.n_spheres, sph_clusters)
    n_bounds = (len(tri_sub_partition(tri_clusters, t_subs))
                if tri_clusters else 1) + len(s_pads)
    if n_bounds > MAX_CLUSTERS:
        # a bare assert is stripped under -O, and the dynamic_update_slice
        # above would then clamp its start index and silently overwrite the
        # lights/camera params (same guard as render_frames_batch)
        raise ValueError(
            f"{n_bounds} cull bounds (tri sub-bounds + sphere clusters) "
            f"exceed MAX_CLUSTERS={MAX_CLUSTERS}; they would overflow the "
            f"params vector")
    # Mosaic executes partial edge blocks ~14x slower than full ones; render
    # at the next tile multiple and crop (the padded rays are harmless)
    h_pad = _round_up(height, tile_h)
    w_pad = _round_up(width, tile_w)
    if lane_split > 1 and (tile_w // lane_split) % 128:
        raise ValueError(
            f"lane_split={lane_split} needs tile_w ({tile_w}) split into "
            f"128-lane-aligned bands (unaligned lane slices lower 10-40x "
            f"slower or are rejected by Mosaic)")
    planes = raytrace_planes(coef, params, h_pad, w_pad, t_pads, s_pads,
                             s_occl, tile_h, tile_w, interpret,
                             total_height if total_height is not None
                             else height, width, t_bound, lane_split,
                             t_subs, ablate)
    if (h_pad, w_pad) != (height, width):
        planes = tuple(p[:height, :width] for p in planes)
    return planes
