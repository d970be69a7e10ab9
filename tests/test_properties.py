"""Property/robustness tests (SURVEY.md §4): extreme states must render
valid frames — finite, in-range, NaN-free — on every path."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_cuda_tpu.core.types import Camera
from raytracing_cuda_tpu.render.pipeline import render_frame
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.scene.textures import procedural_skies
from raytracing_cuda_tpu.sim import state as sim

H, W = 48, 96


@pytest.fixture(scope="module")
def env():
    return build_scene(), jnp.asarray(procedural_skies(32, 64))


def _render_ok(scene, sky, st, path):
    img = np.asarray(render_frame(scene, st, sky, H, W, chunk=2048, path=path))
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    return img


EXTREME_STATES = {
    "camera_inside_island": dict(pos=[0.0, -1.0, 0.0], ver=44.0),
    "camera_below_sea": dict(pos=[0.0, -50.0, 0.0], ver=-44.0),
    "camera_very_far": dict(pos=[5000.0, 800.0, -4000.0], ver=-30.0),
    "day_wraparound": dict(day=24.0),
    "day_zero": dict(day=0.0),
    "sea_above_everything": dict(sea=500.0),
    "sea_far_below": dict(sea=-500.0),
}


def _extreme_state(kw):
    st = sim.init_state()
    if "pos" in kw:
        st = st._replace(cam=Camera(pos=jnp.asarray(kw["pos"], jnp.float32),
                                    hor_angle=jnp.float32(120.0),
                                    ver_angle=jnp.float32(kw.get("ver", 0.0)),
                                    fov=jnp.float32(40.0)))
    if "day" in kw:
        st = st._replace(day_time=jnp.float32(kw["day"]))
    if "sea" in kw:
        st = st._replace(sea_y=jnp.float32(kw["sea"]))
    return sim.settle(st)


@pytest.mark.parametrize("name", sorted(EXTREME_STATES))
@pytest.mark.parametrize("path", ["fast", "pallas_interpret"])
def test_extreme_states_render(env, name, path):
    scene, sky = env
    _render_ok(scene, sky, _extreme_state(EXTREME_STATES[name]), path)


@pytest.mark.parametrize("name", sorted(EXTREME_STATES))
def test_extreme_states_culling_identical(env, name):
    """Cluster culling (incl. the t-bound) must stay conservative in every
    degenerate state — camera inside geometry, sea at ±500 (where the
    sea-plane t that seeds the bound is extreme or always-missing):
    clustered output must be bit-identical to the uncluster swept one."""
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS)

    scene, sky = env
    st = _extreme_state(EXTREME_STATES[name])
    plain = np.asarray(render_frame(scene, st, sky, H, W,
                                    path="pallas_interpret"))
    clustered = np.asarray(render_frame(
        scene, st, sky, H, W, path="pallas_interpret",
        tri_clusters=ISLAND_TRI_CLUSTERS,
        sph_clusters=ISLAND_SPH_CLUSTERS))
    assert np.array_equal(plain, clustered)


def test_paths_agree_on_extremes(env):
    """Even in degenerate states the paths must agree (no NaN divergence)."""
    scene, sky = env
    st = sim.settle(sim.init_state()._replace(sea_y=jnp.float32(500.0)))
    a = _render_ok(scene, sky, st, "fast").astype(np.float32)
    b = _render_ok(scene, sky, st, "pallas_interpret").astype(np.float32)
    rmse = np.sqrt(np.mean(((a - b) / 255.0) ** 2))
    assert rmse < 2e-3
