"""FXAA unit tests on synthetic tiles (kernel.cu:262-403 semantics).

The reference was verified only visually (SURVEY.md §4); these tests pin the
behavioral contract instead: luminance weights, contrast skip thresholds,
border passthrough, edge-direction blending, and off-toggle exactness.
"""

import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.render.fxaa import (
    CONTRAST_THRESHOLD, LUMA_WEIGHTS, RELATIVE_THRESHOLD, apply_fxaa, fxaa,
    luminance)


def test_luma_weights_are_rec709():
    # kernel.cu:293 uses Rec.709 coefficients
    assert abs(sum(LUMA_WEIGHTS) - 1.0) < 2e-6
    r, g, b = LUMA_WEIGHTS
    assert g > r > b


def test_luminance_clamps_at_255():
    img = jnp.full((2, 2, 3), 255.0)
    assert float(luminance(img).max()) <= 1.0


def test_flat_image_passthrough():
    """Zero contrast < threshold → every pixel skipped (kernel.cu:343-354)."""
    img = jnp.full((16, 24, 3), 128, jnp.uint8)
    assert np.array_equal(np.asarray(fxaa(img)), np.asarray(img))


def test_low_contrast_below_absolute_threshold_skipped():
    # luminance step of 3/255 ≈ 0.0118 < CONTRAST_THRESHOLD 0.0312
    img = np.full((16, 24, 3), 100, np.uint8)
    img[:, 12:] = 103
    out = np.asarray(fxaa(jnp.asarray(img)))
    assert np.array_equal(out, img)
    assert CONTRAST_THRESHOLD == 0.0312 and RELATIVE_THRESHOLD == 0.063


def test_hard_edge_blended():
    """A hard vertical luminance edge must change interior edge pixels."""
    img = np.zeros((16, 24, 3), np.uint8)
    img[:, 12:] = 255
    out = np.asarray(fxaa(jnp.asarray(img)))
    interior = out[1:-1, 1:-1]
    src = img[1:-1, 1:-1]
    assert (interior != src).any()
    # blended values must lie between the two source levels
    assert out.min() >= 0 and out.max() <= 255


def test_border_rows_pass_through():
    """Image-border pixels are never modified (kernel.cu:330,399-402)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (20, 32, 3)).astype(np.uint8)
    out = np.asarray(fxaa(jnp.asarray(img)))
    assert np.array_equal(out[0], img[0]) and np.array_equal(out[-1], img[-1])
    assert np.array_equal(out[:, 0], img[:, 0])
    assert np.array_equal(out[:, -1], img[:, -1])


def test_apply_fxaa_off_is_exact_passthrough():
    """alias=false → untouched copy (kernel.cu:275-278)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    out = np.asarray(apply_fxaa(img, jnp.bool_(False)))
    assert np.array_equal(out, np.asarray(img))


def test_horizontal_vs_vertical_edge_pick():
    """A horizontal edge blends from the vertical neighbors and vice versa."""
    imgh = np.zeros((16, 16, 3), np.uint8)
    imgh[8:] = 200
    outh = np.asarray(fxaa(jnp.asarray(imgh))).astype(int)
    # row 7 (above edge) should move toward the row below
    assert (outh[7, 1:-1] > imgh[7, 1:-1]).all()

    imgv = np.zeros((16, 16, 3), np.uint8)
    imgv[:, 8:] = 200
    outv = np.asarray(fxaa(jnp.asarray(imgv))).astype(int)
    assert (outv[1:-1, 7] > imgv[1:-1, 7]).all()


# --- Pallas TPU FXAA kernel (render/fxaa.py Pallas variant) -----------------

def test_pallas_fxaa_matches_oracle_on_rendered_frames():
    """The Pallas kernel agrees with the XLA stencil on real frames.

    Not bit-exact: luminance-comparison TIES (common on this scene's
    flat-shaded pyramid edges) resolve differently under different XLA
    fusions — both neighbor picks are valid FXAA. Gate: tiny mismatch
    fraction and RMSE well inside the render parity budget."""
    from raytracing_cuda_tpu.render.fxaa import fxaa_pallas
    from raytracing_cuda_tpu.render.pipeline import render_frame
    from raytracing_cuda_tpu.scene.builders import build_scene
    from raytracing_cuda_tpu.scene.textures import procedural_skies
    from tests.test_golden import CASES, make_state

    scene = build_scene()
    sky = jnp.asarray(procedural_skies(64, 128))
    for name in ("island_morning", "mountains_day"):
        base = render_frame(scene, make_state(**dict(CASES[name], aa=False)),
                            sky, 96, 160, chunk=4096, path="fast",
                            fxaa_static=False)
        a = np.asarray(fxaa(base)).astype(int)
        b = np.asarray(fxaa_pallas(base, interpret=True)).astype(int)
        d = np.abs(a - b)
        assert np.sqrt(np.mean((d / 255.0) ** 2)) < 2.5e-3, name
        assert np.mean(d.max(-1) > 0) < 0.01, name


def test_pallas_fxaa_band_matches_full_frame():
    """fxaa_ext_pallas on an interior band with true halo rows must equal
    the full-frame Pallas result on those rows (the sharded contract)."""
    from raytracing_cuda_tpu.render.fxaa import fxaa_ext_pallas, fxaa_pallas

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.integers(0, 256, (64, 160, 3)).astype(np.uint8))
    full = np.asarray(fxaa_pallas(img, interpret=True))
    band = np.asarray(fxaa_ext_pallas(img[15:49], row0=16, total_height=64,
                                      interpret=True))
    assert np.array_equal(band, full[16:48])


def test_pallas_fxaa_banded_bit_identical():
    """Over-budget frames auto-split into row bands (1-row halos, global
    row0) and must be bit-identical to the single-plane kernel — the same
    property the ≥4K path relies on (VMEM ceiling guard, fxaa.py)."""
    from raytracing_cuda_tpu.render.fxaa import (_fxaa_plane_bytes,
                                                 fxaa_pallas)

    rng = np.random.default_rng(19)
    img = jnp.asarray(rng.integers(0, 256, (96, 160, 3)).astype(np.uint8))
    full = np.asarray(fxaa_pallas(img, interpret=True))
    # force banding with a budget that fits ~2 tile-rows per band
    tiny = _fxaa_plane_bytes(32, 160, 16, 256) + 1
    banded = np.asarray(fxaa_pallas(img, interpret=True, vmem_budget=tiny))
    assert np.array_equal(banded, full)


def test_pallas_fxaa_vmem_guard():
    """4K fits the default budget; 8K exceeds it (clear fail-fast on the
    band entry point, auto-banding on the frame entry point)."""
    import pytest

    from raytracing_cuda_tpu.render.fxaa import (FXAA_PALLAS_VMEM_BUDGET,
                                                 _fxaa_plane_bytes,
                                                 fxaa_ext_pallas)

    assert _fxaa_plane_bytes(2176, 3840, 16, 256) <= FXAA_PALLAS_VMEM_BUDGET
    assert _fxaa_plane_bytes(4320, 7680, 16, 256) > FXAA_PALLAS_VMEM_BUDGET
    with pytest.raises(ValueError, match="VMEM"):
        fxaa_ext_pallas(jnp.zeros((4322, 7680, 3), jnp.uint8), row0=0,
                        total_height=4320, interpret=True)


def test_pallas_fxaa_borders_and_toggle():
    from raytracing_cuda_tpu.render.fxaa import apply_fxaa_pallas, fxaa_pallas

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    out = np.asarray(fxaa_pallas(jnp.asarray(img), interpret=True))
    assert np.array_equal(out[0], img[0]) and np.array_equal(out[-1], img[-1])
    assert np.array_equal(out[:, 0], img[:, 0])
    assert np.array_equal(out[:, -1], img[:, -1])
    off = np.asarray(apply_fxaa_pallas(jnp.asarray(img), jnp.bool_(False),
                                       interpret=True))
    assert np.array_equal(off, img)
