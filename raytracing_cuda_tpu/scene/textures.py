"""Sky panorama textures: loading, procedural generation, blending, sampling.

The reference binds four 8192x4096 RGBA equirectangular panoramas
(morning/day/evening/night, scene.cpp:626-632) as CUDA point-sampled
normalized textures (kernel.cu:414-442) and blends all four per sky ray with
the skyVars weights using truncating uchar4 arithmetic (kernel.cu:156-163,
structs.h:86-91).

TPU-native design: because the blend weights are uniform per frame, the four
panoramas are pre-blended once per frame into a single uint8 texture by a
fused XLA pass — bit-exact with the reference's per-texel truncated blend —
so the render path pays one gather per sky ray instead of four. Assets load
from the reference's backgrounds/ directory when available (with optional
point-sampled downsampling + an .npz cache) and fall back to a deterministic
procedural sky so the engine is fully standalone.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.core.math3d import PI
from raytracing_cuda_tpu.core.types import SkyTextures

SKY_NAMES = ("morning", "day", "evening", "night")
REFERENCE_BACKGROUNDS = "/root/reference/backgrounds"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CACHE_DIR = os.path.join(_REPO_ROOT, "assets", "cache")


def procedural_skies(height: int = 256, width: int = 512) -> np.ndarray:
    """Deterministic synthetic panoramas, (4, H, W, 3) uint8.

    Stand-ins with the same role as backgrounds/{morning,day,evening,night}.png:
    a vertical sky→horizon gradient per time of day, a sun/moon glow band, and
    hash-noise stars at night. Used by tests and by standalone installs.
    """
    ys = np.linspace(0.0, 1.0, height, dtype=np.float32)[:, None, None]  # 0 = zenith
    xs = np.linspace(0.0, 1.0, width, endpoint=False, dtype=np.float32)[None, :, None]

    # per-time (zenith_rgb, horizon_rgb, glow_rgb, glow_x)
    params = [
        ((70, 110, 190), (255, 170, 110), (255, 210, 120), 0.25),   # morning
        ((90, 150, 235), (200, 225, 255), (255, 255, 230), 0.50),   # day
        ((60, 50, 120), (250, 120, 80), (255, 150, 90), 0.75),      # evening
        ((8, 10, 30), (25, 30, 60), (200, 200, 230), 0.50),         # night
    ]
    out = np.zeros((4, height, width, 3), np.float32)
    for i, (zen, hor, glow, gx) in enumerate(params):
        zen = np.array(zen, np.float32)
        hor = np.array(hor, np.float32)
        glow = np.array(glow, np.float32)
        grad = zen + (hor - zen) * np.clip(ys * 2.0, 0.0, 1.0)  # horizon at y=0.5
        dx = np.minimum(np.abs(xs - gx), 1.0 - np.abs(xs - gx)) * 2.0
        dy = np.abs(ys - 0.45) * 2.0
        halo = np.exp(-(dx**2 + dy**2) * 14.0)
        img = grad + glow * halo * 0.8
        if i == 3:  # stars
            rng = np.random.default_rng(1234)
            stars = (rng.random((height, width, 1)) > 0.9985).astype(np.float32)
            img = img + stars * 200.0 * (ys < 0.55)
        out[i] = img
    return np.clip(out, 0, 255).astype(np.uint8)


def load_reference_skies(path: str = REFERENCE_BACKGROUNDS, downsample: int = 1,
                         cache: bool = True) -> np.ndarray:
    """Load the four reference panoramas, (4, H, W, 3) uint8.

    downsample=k point-samples every k-th texel (preserving nearest-sampling
    character). Decoded arrays are cached under assets/cache/.
    """
    import hashlib

    path_tag = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:8]
    cache_file = os.path.join(CACHE_DIR, f"skies_{path_tag}_ds{downsample}.npz")
    if cache and os.path.exists(cache_file):
        return np.load(cache_file)["texels"]

    from PIL import Image

    planes = []
    for name in SKY_NAMES:
        img = np.asarray(Image.open(os.path.join(path, f"{name}.png")).convert("RGBA"))
        planes.append(img[::downsample, ::downsample, :3])
    texels = np.stack(planes)
    if cache:
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.savez_compressed(cache_file, texels=texels)
    return texels


def load_skies(source: str = "auto", downsample: int = 1,
               procedural_shape: Tuple[int, int] = (2048, 4096)) -> SkyTextures:
    """Resolve sky textures: 'reference', 'procedural', or 'auto' (prefer
    reference assets when present)."""
    if source == "auto":
        source = "reference" if os.path.exists(REFERENCE_BACKGROUNDS) else "procedural"
    if source == "reference":
        texels = load_reference_skies(downsample=downsample)
    elif source == "procedural":
        texels = procedural_skies(*procedural_shape)
    else:
        raise ValueError(f"unknown sky source {source!r}")
    return SkyTextures(texels=texels)


def blend_sky(texels, sky_vars):
    """Pre-blend the four panoramas with the frame's skyVars → (H, W, 3) uint8.

    Reproduces the reference's per-ray blend (kernel.cu:158-162) exactly:
    each texel scaled in float32 and truncated to uchar (structs.h:86-88),
    then summed (weights sum to 1, so no uchar overflow). Because weights are
    uniform across the frame, pre-blending per texel is bit-identical to
    blending per ray.
    """
    texels = jnp.asarray(texels)
    sky_vars = jnp.asarray(sky_vars, jnp.float32)
    acc = jnp.zeros(texels.shape[1:], jnp.uint8)
    for i in range(4):
        term = (texels[i].astype(jnp.float32) * sky_vars[i]).astype(jnp.uint8)
        acc = acc + term
    return acc


def sample_sky(blended, d, day_frac):
    """Equirectangular sky lookup (kernel.cu:156-163) → (..., 3) f32 in [0,1].

    y from asin(dir.y); x from atan2(dir.x, dir.z) shifted by the day
    fraction so the sky rotates with the clock; point sampling with clamp
    addressing like the reference's CUDA texture setup (kernel.cu:429-436).
    """
    h, w = blended.shape[0], blended.shape[1]
    iy, ix = _equirect_indices(h, w, d, day_frac)
    texel = blended.reshape(-1, 3)[iy * w + ix]
    return texel.astype(jnp.float32) * jnp.float32(1.0 / 255.0)


def pack_sky(blended):
    """Pack the blended (H, W, 3) uint8 sky into a flat int32 plane.

    One int32 gather per sky ray instead of a 3-byte row gather — XLA's TPU
    gather pays per index, so packing channels triples throughput.
    """
    b32 = blended.astype(jnp.int32)
    return (b32[..., 0] | (b32[..., 1] << 8) | (b32[..., 2] << 16)).reshape(-1)


def sample_sky_packed(packed, h, w, d, day_frac):
    """Equirect lookup (kernel.cu:156-163) on a pack_sky plane → (..., 3) f32."""
    iy, ix = _equirect_indices(h, w, d, day_frac)
    texel = packed[iy * w + ix]
    rgb = jnp.stack([texel & 0xFF, (texel >> 8) & 0xFF, (texel >> 16) & 0xFF],
                    axis=-1)
    return rgb.astype(jnp.float32) * jnp.float32(1.0 / 255.0)


def _equirect_indices(h, w, d, day_frac):
    """Shared equirect index math (kernel.cu:156-163): direction → (iy, ix)."""
    y = 1.0 - (jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) + PI / 2.0) / PI
    x = jnp.mod((jnp.arctan2(d[..., 0], d[..., 2]) + PI) / (2.0 * PI) + day_frac, 1.0)
    ix = jnp.clip((x * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip((y * h).astype(jnp.int32), 0, h - 1)
    return iy, ix


# --- grouped sky resolve -----------------------------------------------------
#
# XLA's TPU gather pays per *index* (~10 ns each on the bench chip), so the
# per-pixel sky lookup costs ~9 ms/frame at 720p no matter how the texels are
# packed. But adjacent pixels want adjacent texels: primary (and flat-mirror)
# miss directions drift by <1 texel per pixel at the reference FOV. The
# grouped resolve exploits that with one gather per GROUP of 8 pixels:
#
#   * the packed sky is stored as FOUR half-tile-shifted copies, each tiled
#     into (4, 32)-texel tiles flattened to 128-lane rows — the one gather
#     shape Mosaic/XLA lowers to fast row fetches;
#   * per group, a robust (masked-median-anchored) min picks the tile and the
#     phase whose alignment covers the group's texel window;
#   * each pixel one-hot selects its texel from the 128 fetched — VPU work,
#     no gather.
#
# Pixels the first window misses (incoherent reflections at silhouettes)
# get up to two more passes re-anchored on the leftovers, so ≤3 texel
# clusters per group resolve exactly; anything beyond clamps to the nearest
# fetched texel — rare enough to sit far inside the RMSE parity gates.
# Hit pixels (valid=False) are excluded from the anchors so they cannot
# poison a group; their sky value is multiplied by a zero miss-weight
# downstream. Exactness on covered pixels and coverage are pinned by
# tests/test_textures.py; end-to-end parity by tests/test_render_fast.py.

SKY_TILE_Y = 4
SKY_TILE_X = 32
# 16-pixel groups halve the gather-index count vs 8 (gathers pay ~10 ns per
# index on this backend); interleaved A/B on the TPU at 720p: 42.2 → 38.4 ms
# on the cached path, 0.02% of sky pixels fall back to the nearest-texel
# clamp (rmse 7.8e-4 vs 8-pixel groups — far inside the 2e-3 parity gates)
SKY_GROUP = 16
# per-pixel window-select strategy: "twostage" (default: one-hot over the
# window's 4 rows, then over its 32 columns — (4+32)/128 of the
# elementwise work in two fusable stages; bit-identical to onehot, won the
# interleaved A/B 17.30 vs 17.55 ms in-situ), "onehot" (128-wide
# compare+mask+sum), or "binary" (7 halving wheres — measured 3x SLOWER:
# the 7 sequential stages break XLA's fusion). Exact either way; read at
# trace time, so flip before building an engine to A/B.
SKY_SELECT = "twostage"
# group-anchor strategy: "median" (exact masked median, O(G^2) rank
# counting — robust to any outlier mix), "mean" (seam-unwrapped inlier
# mean, O(G)), or "minpix" (the min-y valid PIXEL's coordinates, one
# joint O(G) reduce — both anchors come from the same pixel, so they are
# always mutually consistent). The anchor only decides WHICH window a
# group fetches: covered pixels return identical texels either way; a
# worse anchor only shrinks coverage (leftovers retry in later passes,
# then clamp). BOTH cheap anchors measured SLOWER in-situ despite far
# fewer ops — mean ~+2 ms, minpix +0.84 ms (interleaved A/B at the worst
# pose, 13.62 vs 14.46 ms, 2026-08-17) — the median's rank pass lowers as
# one fused sweep while the reduce-then-select shapes do not; the anchor
# is effectively FREE, so the resolve's remaining cost is gathers +
# selects, not anchoring. Median stays.
SKY_ANCHOR = "median"
# group-tensor layout. The resolve's cost is NOT its compute: the 2026-08-17
# ablation decomposition (experiments/resolve_decompose.py) removed the
# gathers, the select, the anchors, the index math and even a whole pass
# with ~0 ms effect each, while a plumbing-only arm (no compute at all)
# still cost the full 2.78 ms — the entire cost is the (NG, G) dataflow:
# with G = 16 on the minor (lane) axis, every materialized intermediate
# uses 16 of 128 lanes and pads 8x in memory. "gt" carries every per-group
# tensor TRANSPOSED as (G, NG) — G on sublanes, NG (a large multiple of
# 128 at real framebuffer sizes) on lanes — with one well-laid transpose
# in and one out, and is bit-identical by construction (same anchors, same
# windows, same one-hot texel selection, one-hot sums have exactly one
# nonzero term so order cannot matter). "auto" uses gt whenever eligible
# (2-D field, group 16, median anchor); "flat" forces the (NG, G) layout
# (the reference implementation and the fallback for every other shape).
SKY_LAYOUT = "auto"
# grouped-resolve passes: pass k re-anchors on what passes <k missed, so
# k texel clusters per group resolve exactly; leftovers clamp to the
# nearest fetched texel. Default 2: pass 2 matters at silhouettes
# (99.41 → 99.86-100% coverage) but a third pass covered exactly ZERO
# additional pixels on every probed real frame (incl. the worst pose)
# while costing 2.05 ms/frame at 720p (interleaved A/B 17.48 vs 15.43 ms,
# 2026-08-17). Raise to 3 for pathological ≥3-cluster content.
SKY_PASSES = 2


# the compiled-in defaults above, captured BEFORE the autotune override —
# bench.py --tune-sky flips each candidate relative to THESE, so a
# previously-committed tune can never ratchet the candidate set (the
# "shipped" arm must stay the true shipped config, and a default that
# lost once must be able to win again on new silicon)
SHIPPED_SKY_KNOBS = {k: globals()[k] for k in
                     ("SKY_SELECT", "SKY_ANCHOR", "SKY_LAYOUT", "SKY_PASSES")}

# every legal value per knob: all are exact-by-construction variants (same
# texels either way), so an override can never move parity — but an
# unrecognized value would fall through some consumer's silent else-branch
# into an untuned algorithm combination, so only these install
_SKY_KNOB_VALUES = {
    "SKY_SELECT": {"twostage", "onehot", "binary"},
    "SKY_ANCHOR": {"median", "mean", "minpix"},
    "SKY_LAYOUT": {"auto", "gt", "flat"},
    "SKY_PASSES": {1, 2, 3, 4},
}


def _apply_tuned_sky_knobs(path: str | None = None) -> None:
    """Override the shipped sky knobs with autotune.json's tuned winner.

    The launch_knobs pattern (render/pallas_rt.py) applied to the resolve:
    once `bench.py --tune-sky` commits a "sky" section, its `resolved`
    knob set takes effect at import — no manual constant sync, so a tune
    that lands between builder sessions can't leave the module defaults
    (and test_sky_defaults_match_autotune) out of step. Unknown keys and
    values outside _SKY_KNOB_VALUES are ignored; a missing, malformed, or
    structurally-wrong file keeps the shipped defaults (this runs at
    package import — it must never raise)."""
    import json

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "autotune.json")
    try:
        with open(path) as f:
            resolved = json.load(f).get("sky", {}).get("resolved", {})
        items = list(resolved.items())
    except Exception:      # OSError, bad JSON, or valid-JSON wrong shapes
        return             # ({"sky": null}, top-level arrays, ...)
    for k, v in items:
        # str/int only (bool excluded: True == 1 would slip into PASSES;
        # unhashables would make the set test raise)
        if isinstance(v, bool) or not isinstance(v, (str, int)):
            continue
        if v in _SKY_KNOB_VALUES.get(k, ()):
            globals()[k] = v


_apply_tuned_sky_knobs()


def sky_group_for_width(row_w: int) -> int:
    """Sky-resolve group size for a framebuffer row width.

    A pure function of the width so every consumer (single-chip resolve,
    sharded bands, engine cache setup) picks the same partition. 16 needs
    width % 16 == 0: row-sharded bands flatten band-locally, and only
    width-aligned groups partition identically in the band-local and
    full-frame flattens (sharded == single-chip bit parity)."""
    return SKY_GROUP if (row_w >= 32 * SKY_GROUP
                         and row_w % SKY_GROUP == 0) else 8


def grouped_sky_ok(h: int, w: int) -> bool:
    """Can the (h, w) sky use the grouped resolve? (tile divisibility)."""
    return h % SKY_TILE_Y == 0 and w % SKY_TILE_X == 0 and w >= 2 * SKY_TILE_X


def pack_sky_phases(blended):
    """Pack a blended (H, W, 3) uint8 sky into 4 phase-shifted tile planes.

    Returns (4 * (H/4) * (W/32), 128) int32: phase (py, px) is the packed sky
    rolled up/left by half a tile in y/x then cut into (4, 32) tiles, each
    flattened row-major to one 128-lane row. Any aligned half-tile start maps
    to one row of exactly one phase, so a coherent group needs ONE gather.
    """
    b32 = blended.astype(jnp.int32)
    p2d = b32[..., 0] | (b32[..., 1] << 8) | (b32[..., 2] << 16)
    h, w = p2d.shape
    nty, ntx = h // SKY_TILE_Y, w // SKY_TILE_X
    hy, hx = SKY_TILE_Y // 2, SKY_TILE_X // 2
    copies = []
    for py in (0, 1):
        ry = jnp.roll(p2d, -py * hy, axis=0) if py else p2d
        for px in (0, 1):
            r = jnp.roll(ry, -px * hx, axis=1) if px else ry
            copies.append(
                r.reshape(nty, SKY_TILE_Y, ntx, SKY_TILE_X)
                .transpose(0, 2, 1, 3)
                .reshape(nty * ntx, SKY_TILE_Y * SKY_TILE_X))
    return jnp.concatenate(copies, axis=0)


def pack_sky_phases_all(texels):
    """Pack all FOUR raw panoramas into one stacked phase tensor.

    (4, H, W, 3) uint8 → (4, (H/4)*(W/32)*4, 128) int32: panorama i's
    pack_sky_phases plane at index i. Built ONCE at startup; the resolve
    blends per gathered window (sample_sky_grouped_pair), so no per-frame
    blend+pack ever runs — frame cost is flat across the whole 24 h clock
    where the reference pays the 4-way per-ray blend unconditionally
    (kernel.cu:156-163) and the round-2 cached design re-packed the full
    panorama every crossfade frame.
    """
    return jnp.stack([pack_sky_phases(texels[i]) for i in range(4)])


def pack_sky_all(texels):
    """Flat-pack all four raw panoramas → (4, H*W) int32 (pack_sky per
    panorama). The flat-resolve analogue of pack_sky_phases_all."""
    return jnp.stack([pack_sky(texels[i]) for i in range(4)])


def sky_blend_bands(sky_vars):
    """→ (ia, ib, wa, wb): the ≤2 active panoramas and their weights.

    calc_sky_vars (scene.cpp:778-804) yields at most two nonzero adjacent
    weights summing to 1, so the 4-way truncated blend collapses to two
    terms: trunc(tex_a·wa) + trunc(tex_b·wb) is bit-identical to
    blend_sky's Σ trunc(tex_i·w_i) (zero-weight terms truncate to 0; a
    pure band has wa = 1 and trunc(tex·1) = tex exactly).
    """
    sky_vars = jnp.asarray(sky_vars, jnp.float32)
    ia = jnp.argmax(sky_vars).astype(jnp.int32)
    masked = jnp.where(jnp.arange(4) == ia, -1.0, sky_vars)
    ib = jnp.argmax(masked).astype(jnp.int32)
    return ia, ib, sky_vars[ia], jnp.maximum(masked[ib], 0.0)


def _blend_windows(win_a, win_b, wa, wb):
    """Truncated per-channel blend of two packed int32 windows → f32 packed.

    Reproduces blend_sky's per-texel arithmetic (kernel.cu:158-162,
    structs.h:86-88) on the gathered windows: each channel scaled in f32 and
    truncated, then summed; repacked as r + g·256 + b·65536 in f32 (< 2^24,
    exact) — the same value win.astype(f32) yields on a pre-blended pack, so
    the downstream one-hot select is unchanged.
    """
    out = None
    for shift in (0, 8, 16):
        ca = ((win_a >> shift) & 0xFF).astype(jnp.float32)
        cb = ((win_b >> shift) & 0xFF).astype(jnp.float32)
        ch = jnp.floor(ca * wa) + jnp.floor(cb * wb)
        term = ch * jnp.float32(1 << shift)
        out = term if out is None else out + term
    return out


def sky_static_init(sky_texels, grouped: bool | None = None):
    """Build the static sky pack for the render paths → stacked int32 array.

    Rank selects the resolve downstream: 3-D (4, rows, 128) from
    pack_sky_phases_all → grouped pair resolve; 2-D (4, H·W) from
    pack_sky_all → flat pair resolve. Packed ONCE per sky (startup); frames
    blend the ≤2 active panoramas at resolve time (sky_blend_bands), so no
    per-frame blend+pack exists anywhere — the round-2 cached design's
    crossfade-frame full-panorama rebuild is gone by construction.
    """
    h, w = sky_texels.shape[1], sky_texels.shape[2]
    if grouped is None:
        grouped = grouped_sky_ok(h, w)
    texels = jnp.asarray(sky_texels)
    return pack_sky_phases_all(texels) if grouped else pack_sky_all(texels)


def sample_sky_packed_pair(packed_all, h, w, d, day_frac, sky_vars):
    """Flat equirect lookup on a pack_sky_all stack → (..., 3) f32 in [0,1].

    Bit-identical to sample_sky_packed on a pack_sky(blend_sky(...)) plane
    (same truncated two-term blend as sample_sky_grouped_pair, applied per
    pixel). The fallback for sky shapes the grouped layout can't tile.
    """
    iy, ix = _equirect_indices(h, w, d, day_frac)
    idx = iy * w + ix
    ia, ib, wa, wb = sky_blend_bands(sky_vars)
    flat = packed_all.reshape(-1)
    hw = h * w

    def one(_):
        t = flat[ia * hw + idx]
        return jnp.stack([t & 0xFF, (t >> 8) & 0xFF, (t >> 16) & 0xFF],
                         axis=-1).astype(jnp.float32)

    def two(_):
        ta = flat[ia * hw + idx]
        tb = flat[ib * hw + idx]
        chans = [jnp.floor(((ta >> s) & 0xFF).astype(jnp.float32) * wa)
                 + jnp.floor(((tb >> s) & 0xFF).astype(jnp.float32) * wb)
                 for s in (0, 8, 16)]
        return jnp.stack(chans, axis=-1)

    rgb = jax.lax.cond(wb > 0, two, one, None)
    return rgb * jnp.float32(1.0 / 255.0)


def _masked_median(g, valid):
    """Per-row median of the valid entries of g — an actual element, chosen
    by rank counting (no sort). g, valid: (N, G) → (N,) int32. Rows with no
    valid entries return 0 (callers only use them under a zero weight)."""
    big = jnp.int32(1 << 29)
    gv = jnp.where(valid, g, big)
    a = gv[:, :, None]          # candidate j
    b = gv[:, None, :]          # comparator k
    pos = jnp.arange(g.shape[1], dtype=jnp.int32)
    tie = (b == a) & (pos[None, None, :] < pos[None, :, None])
    rank = jnp.sum(((b < a) | tie).astype(jnp.int32), axis=2)   # (N, G)
    nvalid = jnp.sum(valid.astype(jnp.int32), axis=1)
    target = jnp.maximum(nvalid - 1, 0) // 2
    hit = (rank == target[:, None]) & valid
    return jnp.sum(jnp.where(hit, gv, 0), axis=1)


def _fetch_rows(phases):
    """Row fetcher over a single pack_sky_phases plane: tid → (NG, 128) f32."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def fetch(tid):
        win = jax.lax.gather(
            phases, tid[:, None], dn,
            slice_sizes=(1, SKY_TILE_Y * SKY_TILE_X),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)[:, 0, :]
        return win.astype(jnp.float32)       # texels < 2^24: exact
    return fetch


def _fetch_rows_pair(phases_all, sky_vars):
    """Row fetcher over a stacked pack_sky_phases_all tensor.

    Gathers the window from the ≤2 active panoramas and blends them with
    the truncated per-channel arithmetic (_blend_windows). Pure bands
    (wb = 0) take a one-gather branch, so outside the 2 h crossfades the
    resolve costs exactly what a pre-blended plane costs.
    """
    n_rows = phases_all.shape[1]
    flat = phases_all.reshape(-1, phases_all.shape[-1])
    ia, ib, wa, wb = sky_blend_bands(sky_vars)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def gather_band(tid, band):
        return jax.lax.gather(
            flat, (tid + band * n_rows)[:, None], dn,
            slice_sizes=(1, SKY_TILE_Y * SKY_TILE_X),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)[:, 0, :]

    def fetch(tid):
        def pure(_):
            # wa == 1 in a pure band: trunc(tex·1) = tex — the raw panorama
            # IS the blended plane, one gather like the cached design
            return gather_band(tid, ia).astype(jnp.float32)

        def fade(_):
            return _blend_windows(gather_band(tid, ia), gather_band(tid, ib),
                                  wa, wb)

        return jax.lax.cond(wb > 0, fade, pure, None)
    return fetch


def _masked_mean(g, valid):
    """Per-row mean of the valid entries, rounded to int32. O(G) — the
    cheap SKY_ANCHOR; less robust than the median against mixed groups
    (a bad anchor only costs coverage, never correctness)."""
    vf = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(vf, axis=1), 1.0)
    return (jnp.sum(g.astype(jnp.float32) * vf, axis=1) / n
            + 0.5).astype(jnp.int32)


def _masked_mean_circular(g, valid, w):
    """Seam-aware masked mean of equirect x indices: unwrap every entry
    around the first valid element before averaging."""
    big = jnp.int32(1 << 29)
    pos = jnp.arange(g.shape[1], dtype=jnp.int32)
    first = jnp.min(jnp.where(valid, pos, big), axis=1)
    x0 = jnp.sum(jnp.where(pos[None, :] == first[:, None], g, 0), axis=1)
    d = jnp.mod(g - x0[:, None] + w // 2, w) - w // 2
    return x0 + _masked_mean(d, valid)


def _grouped_pass(fetch, h, w, gy, gx, gv):
    """One grouped-gather pass: anchor on the valid pixels, fetch one
    128-texel window per group (fetch: tid → (NG, 128) f32 packed texels),
    select per pixel. Returns (texel f32, covered bool), both (NG, G)."""
    ty, tx = SKY_TILE_Y, SKY_TILE_X
    hy, hx = ty // 2, tx // 2
    nty, ntx = h // ty, w // tx
    big = jnp.int32(1 << 29)

    # robust anchors (then unwrap x across the seam)
    if SKY_ANCHOR == "mean":
        ay = _masked_mean(gy, gv)[:, None]
        ax = _masked_mean_circular(gx, gv, w)[:, None]
    elif SKY_ANCHOR == "minpix":
        # anchor on ONE pixel — the valid pixel with the smallest (iy, pos)
        # key — so ay/ax are trivially consistent (the median computes them
        # independently, which is why it needs the O(G^2) rank pass twice).
        # A divergent outlier can steal the anchor from the majority
        # cluster, but then the majority just resolves in the next pass:
        # per-pass coverage ORDER changes, the k-pass UNION does not
        # (each pass still resolves whole texel clusters).
        G = gy.shape[1]
        pos = jnp.arange(G, dtype=jnp.int32)
        key = jnp.where(gv, gy * G + pos[None, :], big)
        kmin = jnp.min(key, axis=1)                       # (NG,)
        any_v = kmin < big
        ay = jnp.where(any_v, kmin // G, 0)[:, None]
        pos0 = jnp.where(any_v, kmin - ay[:, 0] * G, 0)
        ax = jnp.sum(jnp.where(pos[None, :] == pos0[:, None], gx, 0),
                     axis=1)[:, None]
    else:
        ay = _masked_median(gy, gv)[:, None]
        ax = _masked_median(gx, gv)[:, None]
    dx = jnp.mod(gx - ax + w // 2, w) - w // 2       # in [-w/2, w/2)
    gxu = ax + dx
    inl = gv & (jnp.abs(gy - ay) <= 2 * ty) & (jnp.abs(dx) <= 2 * tx)
    min_iy = jnp.clip(jnp.min(jnp.where(inl, gy, big), axis=1), 0, h - 1)
    min_ix = jnp.min(jnp.where(inl, gxu, big), axis=1)

    # half-tile-aligned window start → (phase, tile row, tile col)
    sy = hy * (min_iy // hy)
    sx = hx * (min_ix // hx)
    py = (sy // hy) % 2
    px = (sx // hx) % 2
    r = jnp.clip(sy // ty, 0, nty - 1)
    k = jnp.mod((sx - px * hx) // tx, ntx)
    tid = (py * 2 + px) * (nty * ntx) + r * ntx + k

    winf = fetch(tid)                                 # (NG, 128) f32, exact

    oy_raw = gy - sy[:, None]
    ox_raw = gxu - sx[:, None]
    covered = (oy_raw >= 0) & (oy_raw < ty) & (ox_raw >= 0) & (ox_raw < tx)
    off = (jnp.clip(oy_raw, 0, ty - 1) * tx + jnp.clip(ox_raw, 0, tx - 1))
    if SKY_SELECT == "twostage":
        # split the 128-lane one-hot into row (4) then column (32) stages:
        # (4+32)/128 of the elementwise work; only two stages, so XLA keeps
        # each as one fused pass (the 7-stage binary fold did not)
        o_row = off // tx
        o_col = off - o_row * tx
        w4 = winf.reshape(winf.shape[0], ty, tx)
        rsel = (jax.lax.broadcasted_iota(jnp.int32, off.shape + (ty,), 2)
                == o_row[:, :, None])
        rowtex = jnp.sum(jnp.where(rsel[..., None], w4[:, None, :, :], 0.0),
                         axis=2)                      # (NG, G, tx)
        csel = (jax.lax.broadcasted_iota(jnp.int32, off.shape + (tx,), 2)
                == o_col[:, :, None])
        texel = jnp.sum(jnp.where(csel, rowtex, 0.0), axis=2)
    elif SKY_SELECT == "binary":
        # per-pixel select of 1-of-128 by folding the window in half once
        # per offset bit: 7 wheres over shrinking slices (~127 elementwise
        # ops/pixel) instead of the 128-wide one-hot compare+mask+sum
        t = jnp.broadcast_to(winf[:, None, :], off.shape + (ty * tx,))
        cur = ty * tx
        while cur > 1:
            half = cur // 2
            bit = (off & half) > 0
            t = jnp.where(bit[:, :, None], t[..., half:cur], t[..., :half])
            cur = half
        texel = t[..., 0]
    else:
        sel = (jax.lax.broadcasted_iota(jnp.int32, off.shape + (ty * tx,), 2)
               == off[:, :, None])
        texel = jnp.sum(jnp.where(sel, winf[:, None, :], 0.0), axis=2)
    return texel, covered


def _masked_median_gt(g, valid):
    """(G, NG)-layout _masked_median: per-COLUMN median of the valid entries
    of g. Same rank-counting arithmetic (candidate j on axis 0, comparator k
    on axis 1, ties broken by position) → (NG,) int32."""
    big = jnp.int32(1 << 29)
    gv = jnp.where(valid, g, big)
    a = gv[:, None, :]          # candidate j
    b = gv[None, :, :]          # comparator k
    pos = jnp.arange(g.shape[0], dtype=jnp.int32)
    tie = (b == a) & (pos[None, :, None] < pos[:, None, None])
    rank = jnp.sum(((b < a) | tie).astype(jnp.int32), axis=1)   # (G, NG)
    nvalid = jnp.sum(valid.astype(jnp.int32), axis=0)
    target = jnp.maximum(nvalid - 1, 0) // 2
    hit = (rank == target[None, :]) & valid
    return jnp.sum(jnp.where(hit, gv, 0), axis=0)


def _grouped_pass_gt(fetch, h, w, gy, gx, gv):
    """_grouped_pass in the (G, NG) layout (SKY_LAYOUT docs above).

    Identical anchor/window/coverage arithmetic; the per-pixel texel select
    is the plain 128-wide one-hot masked sum (exactly one nonzero term, so
    it is bit-identical to the flat path's staged selects). Returns
    (texel f32, covered bool), both (G, NG)."""
    ty, tx = SKY_TILE_Y, SKY_TILE_X
    hy, hx = ty // 2, tx // 2
    nty, ntx = h // ty, w // tx
    big = jnp.int32(1 << 29)

    ay = _masked_median_gt(gy, gv)[None, :]
    ax = _masked_median_gt(gx, gv)[None, :]
    dx = jnp.mod(gx - ax + w // 2, w) - w // 2
    gxu = ax + dx
    inl = gv & (jnp.abs(gy - ay) <= 2 * ty) & (jnp.abs(dx) <= 2 * tx)
    min_iy = jnp.clip(jnp.min(jnp.where(inl, gy, big), axis=0), 0, h - 1)
    min_ix = jnp.min(jnp.where(inl, gxu, big), axis=0)

    sy = hy * (min_iy // hy)
    sx = hx * (min_ix // hx)
    py = (sy // hy) % 2
    px = (sx // hx) % 2
    r = jnp.clip(sy // ty, 0, nty - 1)
    k = jnp.mod((sx - px * hx) // tx, ntx)
    tid = (py * 2 + px) * (nty * ntx) + r * ntx + k          # (NG,)

    winf = fetch(tid)                                        # (NG, 128) f32

    oy_raw = gy - sy[None, :]
    ox_raw = gxu - sx[None, :]
    covered = (oy_raw >= 0) & (oy_raw < ty) & (ox_raw >= 0) & (ox_raw < tx)
    off = (jnp.clip(oy_raw, 0, ty - 1) * tx + jnp.clip(ox_raw, 0, tx - 1))
    sel = (jax.lax.broadcasted_iota(jnp.int32, (ty * tx,) + off.shape, 0)
           == off[None, :, :])
    texel = jnp.sum(jnp.where(sel, winf.T[:, None, :], 0.0), axis=0)
    return texel, covered


def _sample_grouped_gt(fetch, h, w, iy, ix, v, group, with_coverage):
    """(G, NG)-layout driver: transpose in, run the passes, transpose out.

    Both transposes move between well-laid shapes (the (h, w) pixel field
    and the full-lane (G, NG) group field); no (NG, G) tensor ever exists.
    """
    hh, ww = iy.shape
    nb = ww // group

    def to_gt(a):
        return a.reshape(hh, nb, group).transpose(2, 0, 1).reshape(group, -1)

    def from_gt(a):
        return a.reshape(group, hh, nb).transpose(1, 2, 0).reshape(hh, ww)

    gy, gx, gv = to_gt(iy), to_gt(ix), to_gt(v)
    texel = covered = None
    leftover = gv
    for _ in range(SKY_PASSES):          # group >= 16 here (see use_gt)
        tk, ck = _grouped_pass_gt(fetch, h, w, gy, gx, leftover)
        if texel is None:
            texel, covered = tk, ck
        else:
            texel = jnp.where(covered, texel, tk)
            covered = covered | ck
        leftover = leftover & ~covered
    t2 = from_gt(texel.astype(jnp.int32))
    rgb = jnp.stack([t2 & 0xFF, (t2 >> 8) & 0xFF, (t2 >> 16) & 0xFF],
                    axis=-1)
    out = rgb.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    if with_coverage:
        return out, from_gt(covered)
    return out


def sample_sky_grouped(phases, h, w, d, day_frac, valid=None,
                       with_coverage=False):
    """Grouped equirect sky lookup → (..., 3) f32 in [0, 1].

    Drop-in replacement for sample_sky_packed on a pack_sky_phases plane.
    valid marks pixels whose sky value matters (miss-weight > 0); invalid
    pixels never influence group windows and may return arbitrary texels.

    Three passes: each pass re-anchors on the pixels the previous windows
    missed, so up to three texel clusters per group — e.g. direct sky,
    mirror-reflected sky, and one divergent bounce interleaved at a
    silhouette — resolve exactly. Only ≥4-cluster groups (not observed in
    practice, even at tiny framebuffers where per-pixel ray divergence is
    extreme) fall back to the nearest fetched texel.
    """
    return _sample_grouped(_fetch_rows(phases), h, w, d, day_frac, valid,
                           with_coverage)


def sample_sky_grouped_pair(phases_all, h, w, d, day_frac, sky_vars,
                            valid=None, with_coverage=False):
    """Grouped sky lookup on a pack_sky_phases_all stack → (..., 3) f32.

    Blends the ≤2 active panoramas per gathered window with the reference's
    truncated arithmetic — bit-identical to sample_sky_grouped on a
    pre-blended pack_sky_phases(blend_sky(...)) plane (same texel values,
    same anchors, same select), with NO per-frame blend+pack: crossfade
    frames pay one extra row-gather per group instead of a full-panorama
    rebuild, and pure-band frames take the one-gather branch.
    """
    return _sample_grouped(_fetch_rows_pair(phases_all, sky_vars), h, w, d,
                           day_frac, valid, with_coverage)


def _sample_grouped(fetch, h, w, d, day_frac, valid=None,
                    with_coverage=False):
    iy, ix = _equirect_indices(h, w, d, day_frac)
    shape = iy.shape
    # group size scales with row width: 16-pixel groups need 16 adjacent
    # pixels' texels inside one 32-texel window, which holds at real
    # framebuffer widths (measured 99.98% coverage at 1280) but degrades on
    # tiny frames where per-pixel ray divergence is extreme — those keep 8
    group = sky_group_for_width(shape[-1]) if shape else 8
    if (SKY_LAYOUT != "flat" and len(shape) == 2 and group >= 16
            and shape[-1] % group == 0 and SKY_ANCHOR == "median"):
        # real framebuffers take the full-lane transposed layout (bit-
        # identical; see SKY_LAYOUT); every other shape/knob falls through
        # to the (NG, G) reference dataflow below
        v = (jnp.ones(shape, jnp.bool_) if valid is None
             else jnp.broadcast_to(valid, shape))
        return _sample_grouped_gt(fetch, h, w, iy, ix, v, group,
                                  with_coverage)
    iy = iy.reshape(-1)
    ix = ix.reshape(-1)
    n = iy.shape[0]
    if valid is None:
        v = jnp.ones((n,), jnp.bool_)
    else:
        v = jnp.broadcast_to(valid, shape).reshape(-1)
    pad = (-n) % group
    if pad:
        iy = jnp.concatenate([iy, jnp.zeros((pad,), jnp.int32)])
        ix = jnp.concatenate([ix, jnp.zeros((pad,), jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros((pad,), jnp.bool_)])

    gy = iy.reshape(-1, group)
    gx = ix.reshape(-1, group)
    gv = v.reshape(-1, group)

    # the 2-pass default is validated on real (group-16) framebuffers;
    # tiny frames fall back to 8-pixel groups with far wilder per-pixel
    # divergence — keep the third pass there (its cost at those sizes is
    # trivial, and golden tests pin the tiny-frame quality)
    passes = SKY_PASSES if group >= 16 else max(SKY_PASSES, 3)
    texel = None
    covered = None
    leftover = gv
    for _ in range(passes):
        tk, ck = _grouped_pass(fetch, h, w, gy, gx, leftover)
        if texel is None:
            texel, covered = tk, ck
        else:
            texel = jnp.where(covered, texel, tk)
            covered = covered | ck
        leftover = leftover & ~covered
    texel = texel.astype(jnp.int32).reshape(-1)
    if pad:
        texel = texel[:n]
    rgb = jnp.stack([texel & 0xFF, (texel >> 8) & 0xFF, (texel >> 16) & 0xFF],
                    axis=-1)
    out = rgb.astype(jnp.float32).reshape(shape + (3,)) * jnp.float32(1.0 / 255.0)
    if with_coverage:
        cov = covered.reshape(-1)
        if pad:
            cov = cov[:n]
        return out, cov.reshape(shape)
    return out
