"""FXAA anti-aliasing post-pass (antialiasing kernel, kernel.cu:262-403).

The reference implements FXAA as a CUDA block with a 34x34 shared-memory
luminance tile + halo. The TPU-native expression is a pure 3x3 stencil over
the framebuffer built from shifted views (XLA fuses the shifts and all
elementwise math into one VPU pass) — no shared memory, no halo hazards.
For multi-chip row-sharded framebuffers, fxaa_ext consumes 1-row halos
exchanged over ICI (parallel.mesh) and masks borders by *global* row, so the
sharded result is identical to the single-chip one.

Behavioral parity notes:
  - Luminance, thresholds, 12-tap blend filter, smoothstep, and the
    horizontal/vertical edge pick match kernel.cu:289-396 exactly.
  - Border pixels (x or y on the image edge) pass through (kernel.cu:330,399).
  - The reference has an operator-precedence bug in its halo loads
    (kernel.cu:318-319) causing out-of-bounds reads at image borders; the
    garbage values are only ever consumed by border pixels, which pass
    through — so this clean implementation is output-identical. Not
    replicated (SURVEY.md §2 #18: "do NOT replicate").
  - FXAA operates on the already uint8-quantized base image, and its output
    is re-quantized with the same clamp+truncate packing (kernel.cu:26-32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

CONTRAST_THRESHOLD = 0.0312   # kernel.cu:289
RELATIVE_THRESHOLD = 0.063    # kernel.cu:290
LUMA_WEIGHTS = (0.2126729, 0.7151522, 0.0721750)  # Rec.709, kernel.cu:293


def luminance(img_f32):
    """min(255, r*c1 + g*c2 + b*c3) / 255 (kernel.cu:293-298)."""
    c1, c2, c3 = LUMA_WEIGHTS
    lum = img_f32[..., 0] * c1 + img_f32[..., 1] * c2 + img_f32[..., 2] * c3
    return jnp.minimum(255.0, lum) / 255.0


def fxaa_ext(image_ext, row0: int, total_height: int):
    """FXAA over a vertically-extended band.

    image_ext: (h + 2, w, 3) uint8 — the band plus one halo row above and
    below (contents of the halo rows are irrelevant where they correspond to
    out-of-image rows: those pixels pass through as global borders).
    row0/total_height locate the band in the full framebuffer.
    Returns the filtered band, (h, w, 3) uint8.
    """
    h = image_ext.shape[0] - 2
    w = image_ext.shape[1]
    image = image_ext[1:-1]
    img = image.astype(f32)

    # luminance on the extended band, then horizontal edge-pad
    lum_ext = luminance(image_ext.astype(f32))
    lp = jnp.pad(lum_ext, ((0, 0), (1, 1)), mode="edge")  # (h+2, w+2)
    ln = lp[0:h, 1:w + 1]      # y-1
    ls = lp[2:h + 2, 1:w + 1]  # y+1
    le = lp[1:h + 1, 2:w + 2]  # x+1
    lw = lp[1:h + 1, 0:w]      # x-1
    lne = lp[0:h, 2:w + 2]
    lnw = lp[0:h, 0:w]
    lse = lp[2:h + 2, 2:w + 2]
    lsw = lp[2:h + 2, 0:w]
    lm = lp[1:h + 1, 1:w + 1]

    # contrast + skip threshold (kernel.cu:337-354)
    high = jnp.maximum(jnp.maximum(jnp.maximum(jnp.maximum(le, lw), ln), ls), lm)
    low = jnp.minimum(jnp.minimum(jnp.minimum(jnp.minimum(le, lw), ln), ls), lm)
    contrast = high - low
    threshold = jnp.maximum(CONTRAST_THRESHOLD, RELATIVE_THRESHOLD * high)
    skip = contrast < threshold

    # blend factor: 12-tap neighborhood filter + smoothstep (kernel.cu:364-375)
    filt = (2.0 * (le + lw + ls + ln) + lne + lnw + lse + lsw) / 12.0
    filt = jnp.minimum(1.0, jnp.abs(filt - lm) / contrast)
    blend = filt * filt * (3.0 - 2.0 * filt)

    # edge direction from second-derivative taps (kernel.cu:377-392)
    hor = (jnp.abs(ln + ls - 2.0 * lm) * 2.0
           + jnp.abs(lne + lse - 2.0 * le) + jnp.abs(lnw + lsw - 2.0 * lw))
    ver = (jnp.abs(le + lw - 2.0 * lm) * 2.0
           + jnp.abs(lne + lnw - 2.0 * ln) + jnp.abs(lse + lsw - 2.0 * ls))
    is_hor = hor >= ver
    pick_n = jnp.abs(ln - lm) >= jnp.abs(ls - lm)
    pick_e = jnp.abs(le - lm) >= jnp.abs(lw - lm)

    ip = jnp.pad(image_ext.astype(f32), ((0, 0), (1, 1), (0, 0)), mode="edge")
    img_n = ip[0:h, 1:w + 1]
    img_s = ip[2:h + 2, 1:w + 1]
    img_e = ip[1:h + 1, 2:w + 2]
    img_w = ip[1:h + 1, 0:w]
    neighbor = jnp.where(
        is_hor[..., None],
        jnp.where(pick_n[..., None], img_n, img_s),
        jnp.where(pick_e[..., None], img_e, img_w),
    )

    blended = neighbor * blend[..., None] + img * (1.0 - blend[..., None])
    out = jnp.clip(blended, 0.0, 255.0).astype(jnp.uint8)  # rgbToInt semantics

    ys = row0 + jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys > 0) & (ys < total_height - 1) & (xs > 0) & (xs < w - 1)
    use_aa = interior & jnp.logical_not(skip)
    return jnp.where(use_aa[..., None], out, image)


def fxaa(image):
    """Apply FXAA to a full (H, W, 3) uint8 frame → (H, W, 3) uint8."""
    ext = jnp.pad(image, ((1, 1), (0, 0), (0, 0)), mode="edge")
    return fxaa_ext(ext, row0=0, total_height=image.shape[0])


def apply_fxaa(image, enabled):
    """FXAA with the runtime on/off toggle (kernel.cu:275-278 passthrough)."""
    return jax.lax.cond(enabled, fxaa, lambda x: x, image)


# --- Pallas TPU variant -----------------------------------------------------
#
# The XLA stencil above materializes ~20 full-frame intermediates in HBM
# (every shifted tap is its own pad+slice). The Pallas kernel holds the
# whole rgb-packed frame in VMEM and computes every tap in registers: one
# int32 plane in, one out. Math, tap set, thresholds and quantization are
# op-for-op the XLA version's, so outputs are bit-identical (pinned by
# tests/test_fxaa.py); the XLA version stays as the readable oracle and the
# CPU-path implementation.

from raytracing_cuda_tpu.render.pallas_rt import _round_up

# The packed input plane is held fully VMEM-resident, so frame size is
# bounded: the plane must fit under the kernel's 64 MB scoped-VMEM limit
# with headroom for the per-tile window temporaries. 56 MB covers 4K
# (3840x2176 ~= 35 MB) with margin; beyond it fxaa_pallas splits the frame
# into row bands (each VMEM-resident, 1-row halos, identical output) and
# fxaa_ext_pallas fails fast with a clear error.
FXAA_PALLAS_VMEM_BUDGET = 56 * 1024 * 1024


def _fxaa_plane_bytes(h: int, w: int, TH: int, TW: int) -> int:
    """Bytes of the int32 plane fxaa_ext_pallas keeps VMEM-resident for an
    (h, w) band (mirrors the padding arithmetic in fxaa_ext_pallas)."""
    h_pad = _round_up(h, TH)
    w_pad = _round_up(w, TW)
    top = _round_up(h_pad + 8 + 2, 8)
    wid = _round_up(w_pad + 128 + 2, 128)
    return top * wid * 4


def _make_fxaa_kernel(TH, TW):
    import jax.lax as lax

    c1, c2, c3 = LUMA_WEIGHTS

    def kernel(params_ref, in_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        row0 = params_ref[0]
        total_h = params_ref[1]
        total_w = params_ref[2]

        win = in_ref[pl.ds(i * TH, TH + 8), pl.ds(j * TW, TW + 128)]
        rf = (win & 0xFF).astype(f32)
        gf = ((win >> 8) & 0xFF).astype(f32)
        bf = ((win >> 16) & 0xFF).astype(f32)
        # divide (not multiply-by-reciprocal): bit-parity with luminance()
        lum = jnp.minimum(255.0, rf * c1 + gf * c2 + bf * c3) / 255.0

        def tap(a, dy, dx):
            return a[dy:dy + TH, dx:dx + TW]

        lm = tap(lum, 1, 1)
        ln = tap(lum, 0, 1)
        ls = tap(lum, 2, 1)
        le = tap(lum, 1, 2)
        lw = tap(lum, 1, 0)
        lne = tap(lum, 0, 2)
        lnw = tap(lum, 0, 0)
        lse = tap(lum, 2, 2)
        lsw = tap(lum, 2, 0)

        high = jnp.maximum(jnp.maximum(jnp.maximum(jnp.maximum(le, lw), ln),
                                       ls), lm)
        low = jnp.minimum(jnp.minimum(jnp.minimum(jnp.minimum(le, lw), ln),
                                      ls), lm)
        contrast = high - low
        threshold = jnp.maximum(CONTRAST_THRESHOLD, RELATIVE_THRESHOLD * high)
        skip = contrast < threshold

        filt = (2.0 * (le + lw + ls + ln) + lne + lnw + lse + lsw) / 12.0
        filt = jnp.minimum(1.0, jnp.abs(filt - lm) / contrast)
        blend = filt * filt * (3.0 - 2.0 * filt)

        hor = (jnp.abs(ln + ls - 2.0 * lm) * 2.0
               + jnp.abs(lne + lse - 2.0 * le) + jnp.abs(lnw + lsw - 2.0 * lw))
        ver = (jnp.abs(le + lw - 2.0 * lm) * 2.0
               + jnp.abs(lne + lnw - 2.0 * ln) + jnp.abs(lse + lsw - 2.0 * ls))
        is_hor = hor >= ver
        pick_n = jnp.abs(ln - lm) >= jnp.abs(ls - lm)
        pick_e = jnp.abs(le - lm) >= jnp.abs(lw - lm)

        out_ch = []
        for ch in (rf, gf, bf):
            cm = tap(ch, 1, 1)
            neighbor = jnp.where(
                is_hor,
                jnp.where(pick_n, tap(ch, 0, 1), tap(ch, 2, 1)),
                jnp.where(pick_e, tap(ch, 1, 2), tap(ch, 1, 0)))
            blended = neighbor * blend + cm * (1.0 - blend)
            out_ch.append(jnp.clip(blended, 0.0, 255.0).astype(jnp.int32))

        ys = row0 + (i * TH
                     + lax.broadcasted_iota(jnp.int32, (TH, TW), 0)).astype(f32)
        xs = (j * TW
              + lax.broadcasted_iota(jnp.int32, (TH, TW), 1)).astype(f32)
        interior = ((ys > 0) & (ys < total_h - 1)
                    & (xs > 0) & (xs < total_w - 1))
        use_aa = interior & jnp.logical_not(skip)
        aa = out_ch[0] | (out_ch[1] << 8) | (out_ch[2] << 16)
        center = tap(win, 1, 1)
        out_ref[...] = jnp.where(use_aa, aa, center)

    return kernel


def fxaa_ext_pallas(image_ext, row0, total_height: int, TH: int = 16,
                    TW: int = 256, interpret: bool = False,
                    vmem_budget: int = FXAA_PALLAS_VMEM_BUDGET):
    """Pallas fxaa_ext: band + 1-row halos → filtered band, (h, w, 3) u8.

    row0 may be a traced scalar (rides the SMEM params vector — sharded
    bands share one compiled kernel). The packed frame is edge-padded in x,
    aligned up to (8, 128) multiples, and held fully VMEM-resident; each
    grid tile loads its halo'd window at an aligned start. Bands whose
    plane exceeds vmem_budget fail fast — split into smaller bands (see
    fxaa_pallas) or use the XLA fxaa_ext path."""
    h = image_ext.shape[0] - 2
    w = image_ext.shape[1]
    plane_bytes = _fxaa_plane_bytes(h, w, TH, TW)
    if plane_bytes > vmem_budget:
        raise ValueError(
            f"fxaa_ext_pallas: {h}x{w} band needs a {plane_bytes / 2**20:.0f}"
            f" MB VMEM-resident plane (> {vmem_budget / 2**20:.0f} MB budget"
            " under the 64 MB scoped-VMEM limit). Use fxaa_pallas (auto row"
            " banding), smaller bands, or the XLA fxaa_ext path.")
    img32 = image_ext.astype(jnp.int32)
    packed = img32[..., 0] | (img32[..., 1] << 8) | (img32[..., 2] << 16)
    # x edge-pad by 1 (matches the XLA version's mode="edge"), then align:
    # window loads read (TH+8, TW+128) at (8,128)-aligned starts, so the
    # plane needs h+2 rounded up plus one extra tile of slack in each dim
    h_pad = _round_up(h, TH)
    w_pad = _round_up(w, TW)
    top = _round_up(h_pad + 8 + 2, 8)
    wid = _round_up(w_pad + 128 + 2, 128)
    plane = jnp.pad(packed, ((0, top - (h + 2)), (1, wid - w - 1)),
                    mode="edge")
    params = jnp.stack([jnp.asarray(row0, f32),
                        jnp.float32(total_height), jnp.float32(w)])
    out = pl.pallas_call(
        _make_fxaa_kernel(TH, TW),
        grid=(h_pad // TH, w_pad // TW),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole plane resident
        ],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(params, plane)
    out = out[:h, :w]
    rgb = jnp.stack([out & 0xFF, (out >> 8) & 0xFF, (out >> 16) & 0xFF],
                    axis=-1)
    return rgb.astype(jnp.uint8)


def fxaa_pallas(image, interpret: bool = False, TH: int = 16, TW: int = 256,
                vmem_budget: int = FXAA_PALLAS_VMEM_BUDGET):
    """Pallas FXAA on a full (H, W, 3) uint8 frame → (H, W, 3) uint8.

    Frames whose packed plane exceeds the VMEM budget are split into row
    bands with 1-row halos — each band runs the same kernel with its global
    row0, so the banded result is bit-identical to the single-plane one
    (the sharded-mesh path in parallel/mesh.py relies on the same property;
    pinned by tests/test_fxaa.py::test_fxaa_pallas_banded_bit_identical)."""
    h, w = image.shape[0], image.shape[1]
    ext = jnp.pad(image, ((1, 1), (0, 0), (0, 0)), mode="edge")
    if _fxaa_plane_bytes(h, w, TH, TW) <= vmem_budget:
        return fxaa_ext_pallas(ext, row0=0, total_height=h, TH=TH, TW=TW,
                               interpret=interpret, vmem_budget=vmem_budget)
    # Row banding: smallest band count whose per-band plane fits, band
    # heights in whole tiles so interior bands share one compiled kernel.
    nb = 2
    while (_fxaa_plane_bytes(-(-h // nb), w, TH, TW) > vmem_budget
           and nb < h):
        nb += 1
    bh = _round_up(-(-h // nb), TH)
    if _fxaa_plane_bytes(bh, w, TH, TW) > vmem_budget:
        raise ValueError(
            f"fxaa_pallas: no row banding of a {h}x{w} frame fits the"
            f" {vmem_budget / 2**20:.0f} MB VMEM budget with {TH}-row tiles;"
            " use the XLA fxaa path.")
    bands = []
    for r0 in range(0, h, bh):
        r1 = min(h, r0 + bh)
        bands.append(fxaa_ext_pallas(ext[r0:r1 + 2], row0=r0, total_height=h,
                                     TH=TH, TW=TW, interpret=interpret,
                                     vmem_budget=vmem_budget))
    return jnp.concatenate(bands, axis=0)


def apply_fxaa_pallas(image, enabled, interpret: bool = False):
    """Runtime-toggled Pallas FXAA (kernel.cu:275-278 passthrough)."""
    return jax.lax.cond(enabled,
                        lambda x: fxaa_pallas(x, interpret=interpret),
                        lambda x: x, image)
