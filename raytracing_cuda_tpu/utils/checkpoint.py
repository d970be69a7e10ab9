"""Frame-state checkpoint / resume.

The reference has no persistence at all — every run rebuilds state from
scratch (initScene, scene.cpp:654) and a pose can only be recreated by
replaying inputs. Here the whole FrameState pytree (camera pose, clock,
sea level, FXAA flag, sky weights) serializes to a small JSON document, so
benchmark configs, reproductions, and interactive sessions can round-trip
exactly. A new capability, not parity (SURVEY.md §5).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.core.types import Camera
from raytracing_cuda_tpu.sim.state import FrameState

FORMAT = "raytracing_cuda_tpu/state-v1"


def state_to_dict(state: FrameState) -> dict:
    c = state.cam
    return {
        "format": FORMAT,
        "camera": {
            "pos": np.asarray(c.pos).tolist(),
            "hor_angle": float(c.hor_angle),
            "ver_angle": float(c.ver_angle),
            "fov": float(c.fov),
        },
        "day_time": float(state.day_time),
        "play": bool(state.play),
        "sea_y": float(state.sea_y),
        "aa": bool(state.aa),
        "sky_vars": np.asarray(state.sky_vars).tolist(),
        "recolor_vars": np.asarray(state.recolor_vars).tolist(),
    }


def state_from_dict(d: dict) -> FrameState:
    if not isinstance(d, dict):
        raise ValueError(f"checkpoint must be a JSON object, got {type(d).__name__}")
    if d.get("format") != FORMAT:
        raise ValueError(f"unknown state format {d.get('format')!r}")
    # shape-check up front: a malformed field would otherwise surface as an
    # opaque shape error deep inside the jitted render. Missing keys and
    # wrong-typed fields (KeyError/TypeError) also become ValueError so
    # callers have ONE failure mode for a corrupt checkpoint.
    try:
        c = d["camera"]
        if np.asarray(c["pos"], np.float32).shape != (3,):
            raise ValueError(
                f"camera.pos must be 3 scalars, got {c['pos']!r}")
        for key in ("sky_vars", "recolor_vars"):
            if np.asarray(d[key], np.float32).shape != (4,):
                raise ValueError(f"{key} must be 4 scalars, got {d[key]!r}")
        return _build_state(d, c)
    except (KeyError, TypeError) as e:
        raise ValueError(f"malformed checkpoint: {e!r}") from e


def _build_state(d, c):
    f32 = jnp.float32
    return FrameState(
        cam=Camera(pos=jnp.asarray(c["pos"], f32),
                   hor_angle=f32(c["hor_angle"]),
                   ver_angle=f32(c["ver_angle"]),
                   fov=f32(c["fov"])),
        day_time=f32(d["day_time"]),
        play=jnp.bool_(d["play"]),
        sea_y=f32(d["sea_y"]),
        aa=jnp.bool_(d["aa"]),
        sky_vars=jnp.asarray(d["sky_vars"], f32),
        recolor_vars=jnp.asarray(d["recolor_vars"], f32),
    )


def save_state(state: FrameState, path: str) -> None:
    with open(path, "w") as f:
        json.dump(state_to_dict(state), f, indent=2)


def load_state(path: str) -> FrameState:
    with open(path) as f:
        return state_from_dict(json.load(f))
