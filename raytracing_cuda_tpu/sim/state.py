"""Frame-state pytree + pure jittable step functions.

The reference's per-frame host pipeline (animate, scene.cpp:806-816):
moveCamera → controls → recolorObjects → calcSkyVars → moveLights, driven by
polled input and wall-clock deltaTime. Here the whole state machine is a pure
function step(state, action, dt) -> state over the FrameState pytree, and the
per-frame scene mutations (recolor, sea level, light orbit) become a pure
derivation derive_frame(scene, state) evaluated inside the jitted render step.

Ordering quirk preserved: recolorObjects runs *before* calcSkyVars
(scene.cpp:806-816), so object colors always blend with the previous frame's
sky weights. FrameState carries both `sky_vars` (current, drives sky
sampling) and `recolor_vars` (one frame older, drives palette blending).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.core.math3d import rot_y, rot_z, to_rad
from raytracing_cuda_tpu.core.types import Camera, CameraRays, Lights, Scene
from raytracing_cuda_tpu.scene import palettes
from raytracing_cuda_tpu.sim.actions import Action

f32 = jnp.float32

# control-rate constants (scene.cpp:14-32)
MOVE_SPEED = 50.0
CAM_VIEW_DELTA = 0.02
CAM_VIEW_LIMIT = 44.0
RUN_SPEED_UP = 2.0
SEA_SPEED = 2.0
DAY_NIGHT_SPEED = 0.5
DAY_NIGHT_DISTANCE = 500.0
DAY_NIGHT_CONTROL_SPEED = 4.0

TIME_PRESETS = np.array([6.0, 14.0, 18.0, 1.0], np.float32)  # keys 1-4, scene.cpp:713-728
CAM_PRESETS_POS = np.array([[-56, 2.2, 72], [324.4, 12.41, -84]], np.float32)
CAM_PRESETS_HOR = np.array([309.0, 141.2], np.float32)
CAM_PRESETS_VER = np.array([-7.07, -12.65], np.float32)


class FrameState(NamedTuple):
    """Everything scene.cpp keeps in file-static globals, as one pytree."""

    cam: Camera
    day_time: jax.Array      # 0..24 h clock
    play: jax.Array          # bool: automatic time advance
    sea_y: jax.Array         # sea plane height (objects[0].pos.y)
    aa: jax.Array            # bool: FXAA enabled
    sky_vars: jax.Array      # (4,) current blend weights (drives sky sampling)
    recolor_vars: jax.Array  # (4,) previous frame's weights (drives recolor)


def init_camera() -> Camera:
    """initCamera (scene.cpp:165-173)."""
    return Camera(
        pos=jnp.array([-56, 2.2, 72], f32),
        hor_angle=f32(309.0),
        ver_angle=f32(-7.07),
        fov=f32(40.0),
    )


def init_state() -> FrameState:
    """Initial globals (scene.cpp:23-37, 448)."""
    return FrameState(
        cam=init_camera(),
        day_time=f32(6.0),
        play=jnp.bool_(True),
        sea_y=f32(-4.5),
        aa=jnp.bool_(True),
        sky_vars=jnp.array([0, 0, 0, 1], f32),
        recolor_vars=jnp.array([0, 0, 0, 1], f32),
    )


def calc_sky_vars(d):
    """calcSkyVars (scene.cpp:778-804): piecewise 4-way day/night crossfade.

    Pure bands morning 6-8 / day 10-16 / evening 18-20 / night 22-4 with 2 h
    linear fades between them. Returns (4,) weights summing to 1.
    """
    d = f32(d)
    morning = jnp.where((d >= 6) & (d <= 8), 1.0, 0.0)
    day = jnp.where((d >= 10) & (d <= 16), 1.0, 0.0)
    evening = jnp.where((d >= 18) & (d <= 20), 1.0, 0.0)
    night = jnp.where((d >= 22) | (d <= 4), 1.0, 0.0)

    fade = (d - 8.0) / 2.0
    day = jnp.where((d > 8) & (d < 10), fade, day)
    morning = jnp.where((d > 8) & (d < 10), 1.0 - fade, morning)

    fade = (d - 16.0) / 2.0
    evening = jnp.where((d > 16) & (d < 18), fade, evening)
    day = jnp.where((d > 16) & (d < 18), 1.0 - fade, day)

    fade = (d - 20.0) / 2.0
    night = jnp.where((d > 20) & (d < 22), fade, night)
    evening = jnp.where((d > 20) & (d < 22), 1.0 - fade, evening)

    fade = (d - 4.0) / 2.0
    morning = jnp.where((d > 4) & (d < 6), fade, morning)
    night = jnp.where((d > 4) & (d < 6), 1.0 - fade, night)

    return jnp.stack([morning, day, evening, night]).astype(f32)


def get_color_by_time(mats, sky_vars):
    """getColorByTime (scene.cpp:666-672): (4,3) palette x (4,) weights."""
    return jnp.sum(jnp.asarray(mats, f32) * sky_vars[:, None], axis=0)


def move_lights(day_time):
    """moveLights (scene.cpp:758-776): sun/moon orbit + intensity.

    Sun orbits a tilted circle of radius 500 (angle = day-fraction*360 - 120,
    tilted rotY(-45), offset (-500, 0, 500)); moon is antipodal. Both lights
    share color {1,1,1} * |sun.y|/500.
    """
    a = to_rad(jnp.fmod((day_time / 24.0) * 360.0 - 120.0, 360.0))
    base = jnp.stack([jnp.cos(a), jnp.sin(a), jnp.zeros_like(a)]) * DAY_NIGHT_DISTANCE
    sun = rot_y(base, to_rad(f32(-45.0)))
    offset = jnp.array([-500.0, 0.0, 500.0], f32)
    pos = jnp.stack([sun + offset, -sun + offset])
    val = jnp.abs(pos[0, 1]) / DAY_NIGHT_DISTANCE
    color = jnp.broadcast_to(jnp.ones(3, f32) * val, (2, 3))
    return Lights(pos=pos.astype(f32), color=color.astype(f32), intensity=jnp.ones(2, f32))


def camera_rays(cam: Camera, aspect) -> CameraRays:
    """cameraHelperAngles (scene.cpp:100-126): frustum corner directions.

    Corners start as {1, ±h, ±w} (forward = +x), pitched with rotZ(-ver) then
    yawed with rotY(-hor). h = tan(fov/2), w = h * aspect.
    """
    h = jnp.tan(to_rad(cam.fov / 2.0))
    w = h * f32(aspect)
    one = jnp.ones_like(h)
    corners = jnp.stack(
        [
            jnp.stack([one, -h, -w]),  # LD
            jnp.stack([one, -h, w]),   # RD
            jnp.stack([one, h, -w]),   # LU
            jnp.stack([one, h, w]),    # RU
        ]
    )
    corners = rot_y(rot_z(corners, to_rad(-cam.ver_angle)), to_rad(-cam.hor_angle))
    return CameraRays(pos=cam.pos, LD=corners[0], RD=corners[1], LU=corners[2], RU=corners[3])


def update_camera(cam: Camera, action: Action, dt) -> Camera:
    """mouseMotion (scene.cpp:128-140) + moveCamera (scene.cpp:142-163)."""
    # mouse look
    hor = jnp.fmod(cam.hor_angle + CAM_VIEW_DELTA * action.mouse_dx + 360.0, 360.0)
    ver = jnp.clip(cam.ver_angle + CAM_VIEW_DELTA * action.mouse_dy,
                   -CAM_VIEW_LIMIT, CAM_VIEW_LIMIT)

    # WASD/QE translation in the yaw plane
    dir_rad = to_rad(hor)
    forward = jnp.stack([jnp.cos(dir_rad), jnp.zeros_like(dir_rad), jnp.sin(dir_rad)])
    side = jnp.stack([-forward[2], jnp.zeros_like(dir_rad), forward[0]])
    up = jnp.array([0.0, 1.0, 0.0], f32)

    move = (side * f32(action.move_side)
            + forward * f32(action.move_forward)
            + up * f32(action.move_up))
    moving = (action.move_side != 0) | (action.move_forward != 0) | (action.move_up != 0)
    norm = jnp.sqrt(jnp.sum(move * move))
    move = move / jnp.where(moving, norm, 1.0)
    run = jnp.where(action.run, RUN_SPEED_UP, 1.0)
    pos = cam.pos + jnp.where(moving, move * (MOVE_SPEED * run) * f32(dt), 0.0)

    return cam._replace(pos=pos.astype(f32), hor_angle=f32(hor), ver_angle=f32(ver))


def apply_controls(state: FrameState, action: Action, dt) -> FrameState:
    """controls (scene.cpp:689-756): time scrub, play/pause, sea level,
    time/camera presets, FXAA toggle."""
    dt = f32(dt)

    # time: manual scrub overrides automatic advance
    tc = f32(action.time_control)
    scrub = jnp.fmod(
        state.day_time + DAY_NIGHT_SPEED * dt * tc * DAY_NIGHT_CONTROL_SPEED + 24.0, 24.0)
    auto = jnp.fmod(state.day_time + DAY_NIGHT_SPEED * dt + 24.0, 24.0)
    day_time = jnp.where(action.time_control != 0, scrub,
                         jnp.where(state.play, auto, state.day_time))

    # play/pause: P sets true, then O sets false (O wins if both held)
    play = jnp.where(action.set_play, True, state.play)
    play = jnp.where(action.set_pause, False, play)

    # sea level
    sea_y = state.sea_y + f32(action.sea_control) * SEA_SPEED * dt

    # time presets (keys 1-4)
    has_tp = action.time_preset >= 0
    day_time = jnp.where(
        has_tp, jnp.asarray(TIME_PRESETS)[jnp.clip(action.time_preset, 0, 3)], day_time)

    # camera presets (keys 5-6)
    cam = state.cam
    has_cp = action.cam_preset >= 0
    cp = jnp.clip(action.cam_preset, 0, 1)
    cam = cam._replace(
        pos=jnp.where(has_cp, jnp.asarray(CAM_PRESETS_POS)[cp], cam.pos),
        hor_angle=jnp.where(has_cp, jnp.asarray(CAM_PRESETS_HOR)[cp], cam.hor_angle),
        ver_angle=jnp.where(has_cp, jnp.asarray(CAM_PRESETS_VER)[cp], cam.ver_angle),
    )

    # FXAA: B enables, then V disables (V wins if both held)
    aa = jnp.where(action.set_aa_on, True, state.aa)
    aa = jnp.where(action.set_aa_off, False, aa)

    return state._replace(cam=cam, day_time=f32(day_time), play=play,
                          sea_y=f32(sea_y), aa=aa)


def animate(state: FrameState, action: Action, dt) -> FrameState:
    """One host-state step in the reference's order (scene.cpp:806-816).

    mouse+moveCamera → controls → (recolor uses pre-update sky_vars, so it is
    snapshotted into recolor_vars) → calcSkyVars. moveLights is stateless and
    runs in derive_frame at render time.
    """
    cam = update_camera(state.cam, action, dt)
    state = apply_controls(state._replace(cam=cam), action, dt)
    return state._replace(
        recolor_vars=state.sky_vars,
        sky_vars=calc_sky_vars(state.day_time),
    )


def settle(state: FrameState) -> FrameState:
    """Make a hand-built state self-consistent (sky_vars match day_time).

    Used for benchmark presets / golden configs where the state is set
    directly instead of stepped; equivalent to the fixed point of repeated
    animate() with time paused.
    """
    sv = calc_sky_vars(state.day_time)
    return state._replace(sky_vars=sv, recolor_vars=sv)


def derive_frame(scene: Scene, state: FrameState):
    """Per-frame scene derivation: recolorObjects (scene.cpp:674-687) +
    sea level (scene.cpp:708-709) + moveLights proxy spheres (scene.cpp:770-771).

    Returns (scene', lights, ambient). Pure; runs inside the jitted render step.
    """
    rv = state.recolor_vars
    tree_c = get_color_by_time(palettes.MAT_TREE, rv)
    mount_c = get_color_by_time(palettes.MAT_MOUNT, rv)
    lake_c = get_color_by_time(palettes.MAT_LAKE, rv)
    ambient = get_color_by_time(palettes.MAT_AMBIENT, rv)

    color = jnp.where(scene.tree_mask[:, None], tree_c, scene.color)
    color = jnp.where(scene.mount_mask[:, None], mount_c, color)
    color = color.at[0].set(lake_c)

    lights = move_lights(state.day_time)

    # sun/moon proxy spheres are the last two spheres (globals 131, 132)
    sph_pos = jnp.asarray(scene.sph_pos).at[-2:].set(lights.pos)
    center = jnp.asarray(scene.center).at[-2:].set(lights.pos)
    plane_pos = jnp.asarray(scene.plane_pos).at[1].set(state.sea_y)

    scene = scene._replace(color=color, sph_pos=sph_pos, center=center, plane_pos=plane_pos)
    return scene, lights, ambient


def format_time(day_time: float) -> str:
    """getTime / HH:MM formatting (scene.cpp:731-733)."""
    d = float(day_time)
    return "%02d:%02d" % (int(d), int((int(d * 100) % 100) / 100.0 * 60))
