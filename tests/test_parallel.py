"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4).

The row-sharded renderer must be bit-identical to the single-chip one: ray
generation is positioned by global row and FXAA's halo rows arrive over the
mesh (lax.ppermute) instead of local padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_cuda_tpu.parallel.mesh import make_mesh, render_frame_sharded
from raytracing_cuda_tpu.render.pipeline import render_frame
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.scene.textures import procedural_skies
from raytracing_cuda_tpu.sim import state as sim

H, W = 64, 128


@pytest.fixture(scope="module")
def setup():
    scene = build_scene()
    sky = jnp.asarray(procedural_skies(32, 64))
    st = sim.settle(sim.init_state())
    return scene, sky, st


def test_eight_device_mesh_available():
    assert jax.device_count() >= 8, "conftest must force 8 virtual CPU devices"


@pytest.mark.parametrize("n", [2, 4, 8])
def test_sharded_matches_single_chip(setup, n):
    scene, sky, st = setup
    mesh = make_mesh(n)
    single = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096, path="fast"))
    sharded = np.asarray(render_frame_sharded(
        scene, st, sky, mesh=mesh, height=H, width=W, chunk=2048))
    assert np.array_equal(single, sharded), (
        f"{(single != sharded).any(-1).mean():.4%} pixels differ on {n} devices")


def test_sharded_fxaa_off(setup):
    scene, sky, st = setup
    st = st._replace(aa=jnp.bool_(False))
    mesh = make_mesh(4)
    single = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096, path="fast"))
    sharded = np.asarray(render_frame_sharded(
        scene, st, sky, mesh=mesh, height=H, width=W, chunk=2048))
    assert np.array_equal(single, sharded)


def test_indivisible_height_raises(setup):
    scene, sky, st = setup
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        render_frame_sharded(scene, st, sky, mesh=mesh, height=60, width=W)


def test_sharded_pallas_matches_single_chip(setup):
    """Megakernel inside shard_map: band-offset ray generation must make the
    sharded pallas render bit-identical to the single-chip render of the
    SAME pipeline (cached-sky + grouped resolve — bands are whole rows, so
    sky groups and anchors are identical across the two)."""
    scene, sky, st = setup
    from raytracing_cuda_tpu.render.pipeline import render_frame_cached_sky
    from raytracing_cuda_tpu.scene.builders import ISLAND_TRI_CLUSTERS
    from raytracing_cuda_tpu.scene.textures import sky_cache_init

    mesh = make_mesh(4)
    cv, cp = sky_cache_init(sky)
    single, _, _ = render_frame_cached_sky(
        scene, st, sky, cv, cp, H, W,
        tri_clusters=ISLAND_TRI_CLUSTERS, interpret=True)
    sharded = np.asarray(render_frame_sharded(
        scene, st, sky, mesh=mesh, height=H, width=W,
        path="pallas_interpret", tri_clusters=ISLAND_TRI_CLUSTERS))
    assert np.array_equal(np.asarray(single), sharded)

    # and the flat-resolve single-chip render agrees within the parity gate
    flat = np.asarray(render_frame(
        scene, st, sky, H, W, path="pallas_interpret",
        tri_clusters=ISLAND_TRI_CLUSTERS), np.float32)
    diff = np.abs(flat - sharded.astype(np.float32))
    assert np.sqrt(np.mean((diff / 255.0) ** 2)) < 2e-3


def test_sharded_wide_frame_16_group_parity(setup):
    """At widths >= 512 the sky resolve switches to 16-pixel groups
    (textures.sky_group_for_width); the band-local flatten must still
    partition into the same groups as the full-frame flatten, keeping the
    sharded render bit-identical — and the 16-group resolve itself must
    match the oracle (this is the only CPU coverage of the group=16 path
    every real 720p frame takes)."""
    scene, sky, st = setup
    from raytracing_cuda_tpu.render.pipeline import render_frame_cached_sky
    from raytracing_cuda_tpu.scene.builders import ISLAND_TRI_CLUSTERS
    from raytracing_cuda_tpu.scene.textures import (sky_cache_init,
                                                    sky_group_for_width)

    WH, WW = 16, 512                     # band 8 x 512 = 4096 ≡ 0 (mod 16)
    assert sky_group_for_width(WW) == 16
    mesh = make_mesh(2)
    cv, cp = sky_cache_init(sky)
    single, _, _ = render_frame_cached_sky(
        scene, st, sky, cv, cp, WH, WW,
        tri_clusters=ISLAND_TRI_CLUSTERS, interpret=True)
    sharded = np.asarray(render_frame_sharded(
        scene, st, sky, mesh=mesh, height=WH, width=WW,
        path="pallas_interpret", tri_clusters=ISLAND_TRI_CLUSTERS))
    assert np.array_equal(np.asarray(single), sharded)

    oracle = np.asarray(render_frame(scene, st, sky, WH, WW, chunk=4096,
                                     path="oracle"), np.float32)
    diff = np.abs(np.asarray(single, np.float32) - oracle)
    assert np.sqrt(np.mean((diff / 255.0) ** 2)) < 2e-3


def test_sharded_cached_sky_matches_and_traces_one_kernel(setup):
    """Cached-sky sharded render: identical to the uncached sharded render,
    returns the cache carry, skips the 4-panorama blend on reuse, and the
    whole sharded program contains exactly ONE pallas_call (row0 rides the
    SMEM params vector — no per-band kernel variants)."""
    scene, sky, st = setup
    from raytracing_cuda_tpu.scene.builders import ISLAND_TRI_CLUSTERS
    from raytracing_cuda_tpu.scene.textures import sky_cache_init

    mesh = make_mesh(4)
    kw = dict(mesh=mesh, height=H, width=W, path="pallas_interpret",
              tri_clusters=ISLAND_TRI_CLUSTERS)
    uncached = np.asarray(render_frame_sharded(scene, st, sky, **kw))
    cv, cp = sky_cache_init(sky)
    img1, cv1, cp1 = render_frame_sharded(
        scene, st, sky, cached_vars=cv, cached_packed=cp, **kw)
    assert np.array_equal(np.asarray(img1), uncached)
    # second frame reuses the cache (same sky_vars -> no re-blend) exactly
    img2, cv2, cp2 = render_frame_sharded(
        scene, st, sky, cached_vars=cv1, cached_packed=cp1, **kw)
    assert np.array_equal(np.asarray(img2), uncached)
    assert np.array_equal(np.asarray(cp1), np.asarray(cp2))

    jaxpr = jax.make_jaxpr(
        lambda sc, s, sk, v, p: render_frame_sharded(
            sc, s, sk, cached_vars=v, cached_packed=p, **kw)
    )(scene, st, sky, cv, cp)
    assert str(jaxpr).count("pallas_call") == 1


def test_engine_sharded_cached_fused_step():
    """Engine(sharded=True) on the pallas path: frame() and the fused
    step_and_frame/batch run through the mesh with the cached sky."""
    from raytracing_cuda_tpu.app.loop import Engine
    from raytracing_cuda_tpu.sim.actions import Action
    from raytracing_cuda_tpu.utils.config import RenderConfig

    eng = Engine(RenderConfig(width=128, height=64, sky_source="procedural",
                              procedural_sky_shape=(32, 64),
                              path="pallas_interpret", chunk=2048),
                 sharded=True)
    img = eng.frame_np()
    assert img.shape == (64, 128, 3) and img.dtype == np.uint8
    img2 = np.asarray(eng.step_and_frame(Action.idle(), 1 / 60))
    assert img2.shape == (64, 128, 3)
    imgs = np.asarray(eng.step_and_frame_batch([Action.idle()] * 2))
    assert imgs.shape == (2, 64, 128, 3)


def test_engine_sharded_smoke():
    """Engine(sharded=True) renders through the mesh path end-to-end."""
    from raytracing_cuda_tpu.app.loop import Engine
    from raytracing_cuda_tpu.utils.config import RenderConfig

    eng = Engine(RenderConfig(width=128, height=64, sky_source="procedural",
                              procedural_sky_shape=(32, 64), path="fast",
                              chunk=2048), sharded=True)
    img = eng.frame_np()
    assert img.shape == (64, 128, 3) and img.dtype == np.uint8
