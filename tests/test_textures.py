"""Sky texture pipeline tests: blend weights, packing, sampling.

Pins the per-frame pre-blend (scene/textures.py blend_sky) to the reference's
per-ray truncating uchar blend (kernel.cu:158-162, structs.h:86-88) and the
packed-int32 gather path to the reference's point-sampled equirect lookup
(kernel.cu:156-163).
"""

import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.scene.textures import (
    blend_sky, pack_sky, procedural_skies, sample_sky, sample_sky_packed)


def test_blend_matches_truncating_uchar_reference():
    rng = np.random.default_rng(11)
    tex = rng.integers(0, 256, (4, 8, 16, 3)).astype(np.uint8)
    w = np.array([0.25, 0.25, 0.3, 0.2], np.float32)
    got = np.asarray(blend_sky(jnp.asarray(tex), jnp.asarray(w)))
    want = sum((tex[i].astype(np.float32) * w[i]).astype(np.uint8)
               for i in range(4)).astype(np.uint8)
    assert np.array_equal(got, want)


def test_blend_pure_band_is_identity():
    tex = procedural_skies(16, 32)
    got = np.asarray(blend_sky(jnp.asarray(tex), jnp.asarray([0, 1, 0, 0], np.float32)))
    assert np.array_equal(got, tex[1])


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(5)
    blended = jnp.asarray(rng.integers(0, 256, (8, 16, 3)).astype(np.uint8))
    packed = pack_sky(blended)
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    a = np.asarray(sample_sky(blended, d, 0.3))
    b = np.asarray(sample_sky_packed(packed, 8, 16, d, 0.3))
    assert np.array_equal(a, b)


def test_sample_sky_day_rotation():
    """The sky rotates with the clock: x shifted by day fraction (kernel.cu:157)."""
    blended = jnp.asarray(
        (np.arange(32)[None, :, None] * np.ones((4, 1, 3)) * 8).astype(np.uint8))
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)   # atan2(0,1)=0 → x=0.5
    s0 = np.asarray(sample_sky(blended, d, 0.0))
    s_half = np.asarray(sample_sky(blended, d, 0.5))
    # half-day shift moves the lookup halfway around the panorama
    assert not np.array_equal(s0, s_half)


def test_sample_sky_poles_clamp():
    blended = jnp.asarray(np.zeros((8, 16, 3), np.uint8))
    for dy in (1.0, -1.0):
        d = jnp.asarray([[0.0, dy, 0.0]], jnp.float32)
        out = np.asarray(sample_sky(blended, d, 0.25))
        assert out.shape == (1, 3)  # no index error at the poles


def test_procedural_skies_deterministic():
    a = procedural_skies(16, 32)
    b = procedural_skies(16, 32)
    assert np.array_equal(a, b)
    assert a.shape == (4, 16, 32, 3) and a.dtype == np.uint8


# --- grouped sky resolve ------------------------------------------------------


def _smooth_dirs(h_img, w_img, outlier_frac=0.0, seed=3):
    """A primary-ray-like smooth direction field with optional incoherent
    outliers (stand-ins for divergent reflection misses at silhouettes)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-0.4, 0.5, h_img),
                         np.linspace(-0.9, 0.9, w_img), indexing="ij")
    d = np.stack([np.sin(xx), yy, np.cos(xx)], axis=-1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if outlier_frac:
        m = rng.random((h_img, w_img)) < outlier_frac
        r = rng.normal(size=(h_img, w_img, 3)).astype(np.float32)
        r /= np.linalg.norm(r, axis=-1, keepdims=True)
        d = np.where(m[..., None], r, d)
    return jnp.asarray(d)


def test_grouped_resolve_exact_on_covered():
    """Covered pixels must return the IDENTICAL texel as the flat per-pixel
    gather, at several day fractions (sky rotation crosses the x seam)."""
    from raytracing_cuda_tpu.scene.textures import (grouped_sky_ok,
                                                    pack_sky_phases,
                                                    sample_sky_grouped)

    rng = np.random.default_rng(0)
    H, W = 64, 128
    assert grouped_sky_ok(H, W)
    blended = jnp.asarray(rng.integers(0, 256, (H, W, 3)).astype(np.uint8))
    packed = pack_sky(blended)
    phases = pack_sky_phases(blended)
    d = _smooth_dirs(33, 57, outlier_frac=0.02)    # odd sizes exercise padding
    valid = jnp.asarray(rng.random((33, 57)) > 0.3)
    for day_frac in (0.0, 0.37, 0.93):
        ref = np.asarray(sample_sky_packed(packed, H, W, d, day_frac))
        got, cov = sample_sky_grouped(phases, H, W, d, day_frac,
                                      valid=valid, with_coverage=True)
        got, cov = np.asarray(got), np.asarray(cov)
        m = cov & np.asarray(valid)
        assert m.mean() > 0.5
        assert np.array_equal(got[m], ref[m])


def test_grouped_resolve_coherent_field_fully_covered():
    """A dense primary-ray field (many pixels per texel, no outliers) must be
    100% covered — the grouped path is then bit-exact with the flat path."""
    from raytracing_cuda_tpu.scene.textures import (pack_sky_phases,
                                                    sample_sky_grouped)

    rng = np.random.default_rng(7)
    H, W = 64, 128
    blended = jnp.asarray(rng.integers(0, 256, (H, W, 3)).astype(np.uint8))
    packed = pack_sky(blended)
    phases = pack_sky_phases(blended)
    # 128 pixels across 0.5 rad of yaw → ~0.08 texel/pixel at this sky size
    yy, xx = np.meshgrid(np.linspace(0.1, 0.25, 48),
                         np.linspace(1.2, 1.7, 128), indexing="ij")
    d = np.stack([np.sin(xx), yy, np.cos(xx)], axis=-1).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ref = np.asarray(sample_sky_packed(packed, H, W, d, 0.11))
    got, cov = sample_sky_grouped(phases, H, W, d, 0.11, with_coverage=True)
    assert np.asarray(cov).all()
    assert np.array_equal(np.asarray(got), ref)


def test_grouped_resolve_invalid_pixels_cannot_poison_groups():
    """Hit pixels (valid=False) carry meaningless directions; interleaving
    them densely must not perturb the valid pixels' texels."""
    from raytracing_cuda_tpu.scene.textures import (pack_sky_phases,
                                                    sample_sky_grouped)

    rng = np.random.default_rng(9)
    H, W = 64, 128
    blended = jnp.asarray(rng.integers(0, 256, (H, W, 3)).astype(np.uint8))
    packed = pack_sky(blended)
    phases = pack_sky_phases(blended)
    d = np.asarray(_smooth_dirs(16, 64))
    valid = rng.random((16, 64)) > 0.5
    junk = rng.normal(size=d.shape).astype(np.float32)
    junk /= np.linalg.norm(junk, axis=-1, keepdims=True)
    d_poisoned = jnp.asarray(np.where(valid[..., None], d, junk))
    ref = np.asarray(sample_sky_packed(packed, H, W, jnp.asarray(d), 0.2))
    got, cov = sample_sky_grouped(phases, H, W, d_poisoned, 0.2,
                                  valid=jnp.asarray(valid), with_coverage=True)
    m = np.asarray(cov) & valid
    assert m.sum() > 0.9 * valid.sum()
    assert np.array_equal(np.asarray(got)[m], ref[m])


def test_grouped_resolve_knobs_exact_on_covered():
    """Every SKY_SELECT x SKY_ANCHOR knob combo (the A/B space of
    experiments/ab_resolve.py) must stay exact on covered pixels and keep
    coverage high on an outlier-bearing field — the knobs may only trade
    COVERAGE, never correctness."""
    import itertools

    from raytracing_cuda_tpu.scene import textures as T

    rng = np.random.default_rng(13)
    H, W = 64, 128
    blended = jnp.asarray(rng.integers(0, 256, (H, W, 3)).astype(np.uint8))
    packed = pack_sky(blended)
    phases = T.pack_sky_phases(blended)
    d = _smooth_dirs(32, 64, outlier_frac=0.03)
    valid = jnp.asarray(rng.random((32, 64)) > 0.3)
    ref = np.asarray(sample_sky_packed(packed, H, W, d, 0.29))
    old = (T.SKY_SELECT, T.SKY_ANCHOR)
    try:
        for sel, anc in itertools.product(("onehot", "twostage", "binary"),
                                          ("median", "mean", "minpix")):
            T.SKY_SELECT, T.SKY_ANCHOR = sel, anc
            got, cov = T.sample_sky_grouped(phases, H, W, d, 0.29,
                                            valid=valid, with_coverage=True)
            m = np.asarray(cov) & np.asarray(valid)
            frac = m.sum() / np.asarray(valid).sum()
            assert frac > 0.9, f"{sel}/{anc}: coverage {frac}"
            assert np.array_equal(np.asarray(got)[m], ref[m]), f"{sel}/{anc}"
    finally:
        T.SKY_SELECT, T.SKY_ANCHOR = old


def test_grouped_resolve_gt_layout_bit_identical():
    """The (G, NG) transposed layout (SKY_LAYOUT="gt"/"auto", the full-lane
    TPU dataflow) must return bit-identical texels AND coverage vs the
    (NG, G) reference dataflow ("flat"), pure-band and mid-fade, with a
    valid mask and outliers — it is a layout change, not an algorithm
    change. Width 512 engages the 16-pixel-group (gt-eligible) path."""
    from raytracing_cuda_tpu.scene import textures as T

    rng = np.random.default_rng(17)
    H, W = 64, 128
    tex = rng.integers(0, 256, (4, H, W, 3)).astype(np.uint8)
    stack = T.sky_static_init(jnp.asarray(tex))
    d = _smooth_dirs(8, 512, outlier_frac=0.03)
    valid = jnp.asarray(rng.random((8, 512)) > 0.3)
    assert T.sky_group_for_width(512) == 16
    old = T.SKY_LAYOUT
    try:
        for sv in ([0, 1, 0, 0], [0.25, 0.75, 0, 0]):
            svj = jnp.asarray(sv, np.float32)
            outs = {}
            for lay in ("flat", "auto"):
                T.SKY_LAYOUT = lay
                got, cov = T.sample_sky_grouped_pair(
                    stack, H, W, d, 0.37, svj, valid=valid,
                    with_coverage=True)
                outs[lay] = (np.asarray(got), np.asarray(cov))
            assert np.array_equal(outs["flat"][0], outs["auto"][0]), sv
            assert np.array_equal(outs["flat"][1], outs["auto"][1]), sv
            assert outs["auto"][1].mean() > 0.9
    finally:
        T.SKY_LAYOUT = old


def test_sky_static_init_shapes():
    from raytracing_cuda_tpu.scene.textures import (SKY_TILE_X, SKY_TILE_Y,
                                                    sky_static_init)

    tex = procedural_skies(64, 128)
    sp = sky_static_init(jnp.asarray(tex))
    assert sp.shape == (4, 4 * (64 // SKY_TILE_Y) * (128 // SKY_TILE_X),
                        SKY_TILE_Y * SKY_TILE_X)
    sp2 = sky_static_init(jnp.asarray(tex), grouped=False)
    assert sp2.shape == (4, 64 * 128)


def test_sky_blend_bands_picks_active_panoramas():
    """sky_blend_bands must recover the ≤2 nonzero weights of calc_sky_vars
    across the whole clock (pure bands, fades, the fade midpoint tie)."""
    from raytracing_cuda_tpu.scene.textures import sky_blend_bands
    from raytracing_cuda_tpu.sim.state import calc_sky_vars

    for day in (6.0, 7.9, 8.5, 9.0, 9.99, 14.0, 16.5, 17.0, 19.0, 21.3,
                23.0, 1.0, 4.4, 5.0, 5.9):
        sv = np.asarray(calc_sky_vars(day))
        ia, ib, wa, wb = (np.asarray(v) for v in sky_blend_bands(sv))
        w = np.zeros(4, np.float32)
        w[ia] += wa
        w[int(ib)] += wb
        assert np.allclose(w, sv, atol=0), f"day {day}: {w} vs {sv}"
        assert wa >= wb >= 0


def test_pair_resolve_bit_identical_to_preblended():
    """The static-stack pair resolve must be bit-identical to resolving a
    pre-blended pack — in pure bands (one-gather branch) AND mid-fade
    (two-gather truncated blend), grouped and flat."""
    from raytracing_cuda_tpu.scene.textures import (
        pack_sky_phases, pack_sky, sample_sky_grouped,
        sample_sky_grouped_pair, sample_sky_packed_pair, sky_static_init)

    rng = np.random.default_rng(21)
    H, W = 64, 128
    tex = rng.integers(0, 256, (4, H, W, 3)).astype(np.uint8)
    texj = jnp.asarray(tex)
    sp_grouped = sky_static_init(texj)
    sp_flat = sky_static_init(texj, grouped=False)
    d = _smooth_dirs(32, 64, outlier_frac=0.02)
    valid = jnp.asarray(rng.random((32, 64)) > 0.3)
    for sv in ([0, 1, 0, 0], [0.25, 0.75, 0, 0], [0, 0, 0.95, 0.05],
               [0.5, 0, 0, 0.5]):
        svj = jnp.asarray(sv, jnp.float32)
        blended = blend_sky(texj, svj)
        ref_flat = np.asarray(sample_sky_packed(pack_sky(blended), H, W,
                                                d, 0.37))
        got_flat = np.asarray(sample_sky_packed_pair(sp_flat, H, W, d, 0.37,
                                                     svj))
        assert np.array_equal(got_flat, ref_flat), f"flat {sv}"
        ref_g, ref_cov = sample_sky_grouped(
            pack_sky_phases(blended), H, W, d, 0.37, valid=valid,
            with_coverage=True)
        got_g, got_cov = sample_sky_grouped_pair(
            sp_grouped, H, W, d, 0.37, svj, valid=valid, with_coverage=True)
        assert np.array_equal(np.asarray(got_cov), np.asarray(ref_cov))
        assert np.array_equal(np.asarray(got_g), np.asarray(ref_g)), \
            f"grouped {sv}"


def test_apply_tuned_sky_knobs(tmp_path):
    """autotune.json's sky.resolved overrides the shipped knobs at import
    (the launch_knobs pattern); unknown keys, wrong types, and missing or
    malformed files are ignored."""
    import json

    import raytracing_cuda_tpu.scene.textures as tex

    keys = ("SKY_SELECT", "SKY_ANCHOR", "SKY_LAYOUT", "SKY_PASSES")
    saved = {k: getattr(tex, k) for k in keys}
    try:
        p = tmp_path / "autotune.json"
        p.write_text(json.dumps({"sky": {"resolved": {
            "SKY_SELECT": "onehot", "SKY_PASSES": 3,
            "SKY_BOGUS": "x", "SKY_ANCHOR": 7,
            "SKY_LAYOUT": "medain"}}}))           # typo'd value: ignored
        tex._apply_tuned_sky_knobs(str(p))
        assert tex.SKY_SELECT == "onehot" and tex.SKY_PASSES == 3
        assert tex.SKY_ANCHOR == saved["SKY_ANCHOR"]   # wrong type: ignored
        assert tex.SKY_LAYOUT == saved["SKY_LAYOUT"]   # bad value: ignored
        assert "SKY_BOGUS" not in vars(tex)            # unknown key: ignored
        tex._apply_tuned_sky_knobs(str(tmp_path / "missing.json"))
        (tmp_path / "bad.json").write_text("{not json")
        tex._apply_tuned_sky_knobs(str(tmp_path / "bad.json"))
        # structurally-wrong-but-valid JSON must not raise at import time
        (tmp_path / "null.json").write_text('{"sky": null}')
        tex._apply_tuned_sky_knobs(str(tmp_path / "null.json"))
        (tmp_path / "arr.json").write_text('[1, 2]')
        tex._apply_tuned_sky_knobs(str(tmp_path / "arr.json"))
        (tmp_path / "list.json").write_text(
            '{"sky": {"resolved": {"SKY_PASSES": [2]}}}')
        tex._apply_tuned_sky_knobs(str(tmp_path / "list.json"))
        assert tex.SKY_SELECT == "onehot"              # unchanged by all
        # SHIPPED_SKY_KNOBS stays the compiled-in defaults (tune-sky flips
        # candidates relative to it — a committed tune must never ratchet)
        assert tex.SHIPPED_SKY_KNOBS["SKY_SELECT"] == "twostage"
        assert tex.SHIPPED_SKY_KNOBS["SKY_PASSES"] == 2
    finally:
        for k, v in saved.items():
            setattr(tex, k, v)
