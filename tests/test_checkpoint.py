"""Checkpoint round-trip: FrameState → JSON → FrameState → identical frame."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.render.pipeline import render_frame
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.scene.textures import procedural_skies
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.utils.checkpoint import load_state, save_state


def test_roundtrip_values(tmp_path):
    st = sim.settle(sim.init_state()._replace(
        day_time=jnp.float32(17.25), sea_y=jnp.float32(-2.0),
        aa=jnp.bool_(False)))
    p = str(tmp_path / "state.json")
    save_state(st, p)
    back = load_state(p)
    for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(back)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_renders_identically(tmp_path):
    scene = build_scene()
    sky = jnp.asarray(procedural_skies(32, 64))
    st = sim.settle(sim.init_state()._replace(day_time=jnp.float32(19.0)))
    p = str(tmp_path / "state.json")
    save_state(st, p)
    a = np.asarray(render_frame(scene, st, sky, 48, 64, chunk=3072, path="fast"))
    b = np.asarray(render_frame(scene, load_state(p), sky, 48, 64, chunk=3072,
                                path="fast"))
    assert np.array_equal(a, b)


def test_unknown_format_rejected(tmp_path):
    import json

    import pytest

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"format": "nope"}))
    with pytest.raises(ValueError):
        load_state(str(p))
