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
