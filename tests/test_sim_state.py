"""State-machine parity: calcSkyVars, moveLights, camera, controls
(scene.cpp:100-173, 689-816)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_cuda_tpu.core.math3d import to_rad
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.sim.actions import Action


def sky_vars_np(d):
    """Independent host-side reimplementation of calcSkyVars (scene.cpp:778-804)."""
    v = [0.0, 0.0, 0.0, 0.0]
    if 6 <= d <= 8:
        v[0] = 1
    if 10 <= d <= 16:
        v[1] = 1
    if 18 <= d <= 20:
        v[2] = 1
    if d >= 22 or d <= 4:
        v[3] = 1
    if 8 < d < 10:
        v[1] = (d - 8) / 2
        v[0] = 1 - v[1]
    if 16 < d < 18:
        v[2] = (d - 16) / 2
        v[1] = 1 - v[2]
    if 20 < d < 22:
        v[3] = (d - 20) / 2
        v[2] = 1 - v[3]
    if 4 < d < 6:
        v[0] = (d - 4) / 2
        v[3] = 1 - v[0]
    return np.array(v, np.float32)


def test_calc_sky_vars_bands_and_fades():
    for d in [0.0, 1.0, 4.0, 4.5, 5.0, 6.0, 7.5, 8.0, 9.0, 10.0, 13.0, 16.0,
              17.0, 18.0, 19.9, 20.0, 21.0, 22.0, 23.99]:
        got = np.asarray(sim.calc_sky_vars(d))
        np.testing.assert_allclose(got, sky_vars_np(d), atol=1e-6, err_msg=f"d={d}")
        assert np.isclose(got.sum(), 1.0, atol=1e-6)


def test_move_lights_matches_reference_formula():
    for day in [0.0, 1.0, 6.0, 12.0, 14.0, 18.0, 23.5]:
        lights = jax.tree.map(np.asarray, sim.move_lights(jnp.float32(day)))
        # independent numpy computation (moveLights, scene.cpp:758-776)
        a = np.float32(to_rad(np.fmod((day / 24.0) * 360.0 - 120.0, 360.0)))
        base = np.array([np.cos(a), np.sin(a), 0.0]) * 500.0
        t = np.float32(to_rad(np.float32(-45.0)))
        sun = np.array(
            [np.cos(t) * base[0] + np.sin(t) * base[2], base[1],
             -np.sin(t) * base[0] + np.cos(t) * base[2]])
        off = np.array([-500.0, 0.0, 500.0])
        np.testing.assert_allclose(lights.pos[0], sun + off, atol=1e-2)
        np.testing.assert_allclose(lights.pos[1], -sun + off, atol=1e-2)
        val = abs(lights.pos[0][1]) / 500.0
        np.testing.assert_allclose(lights.color, np.full((2, 3), val), atol=1e-5)


def test_sun_at_noonish_high():
    # day 14h: angle = 14/24*360-120 = 90° → sun at zenith of its orbit
    lights = sim.move_lights(jnp.float32(14.0))
    assert float(lights.pos[0][1]) > 499.0
    np.testing.assert_allclose(np.asarray(lights.color[0]), [1, 1, 1], atol=1e-3)


def test_camera_rays_default_pose():
    cam = sim.init_camera()
    rays = jax.tree.map(np.asarray, sim.camera_rays(cam, 1280 / 720))
    # corners must be symmetric about the view axis and unit-ish scale
    # forward = mean of corners normalized
    fwd = (rays.LD + rays.RD + rays.LU + rays.RU) / 4
    fwd /= np.linalg.norm(fwd)
    # reference forward at hor=309, ver=-7.07 (rotZ then rotY of +x)
    hr = to_rad(np.float32(-309.0))
    vr = to_rad(np.float32(7.07))
    f0 = np.array([np.cos(vr), np.sin(vr), 0.0])
    f0 = np.array([np.cos(hr) * f0[0] + np.sin(hr) * f0[2], f0[1],
                   -np.sin(hr) * f0[0] + np.cos(hr) * f0[2]])
    np.testing.assert_allclose(fwd, f0 / np.linalg.norm(f0), atol=1e-4)
    # fov: angle between LD and RD horizontal spread
    h = np.tan(to_rad(np.float32(20.0)))
    w = h * 1280 / 720
    np.testing.assert_allclose(np.linalg.norm(rays.RU - rays.LU), 2 * w, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(rays.LU - rays.LD), 2 * h, atol=1e-4)


def test_update_camera_motion():
    cam = sim.init_camera()
    act = Action.idle()._replace(move_forward=np.int32(1))
    c2 = jax.tree.map(np.asarray, sim.update_camera(cam, act, 0.1))
    d = np.array([np.cos(to_rad(np.float32(309.0))), 0,
                  np.sin(to_rad(np.float32(309.0)))])
    np.testing.assert_allclose(c2.pos, np.asarray(cam.pos) + d * 5.0, atol=1e-4)

    # shift doubles speed
    act_run = act._replace(run=np.bool_(True))
    c3 = jax.tree.map(np.asarray, sim.update_camera(cam, act_run, 0.1))
    np.testing.assert_allclose(c3.pos, np.asarray(cam.pos) + d * 10.0, atol=1e-4)

    # diagonal movement is normalized (scene.cpp:159)
    act_diag = act._replace(move_side=np.int32(1))
    c4 = jax.tree.map(np.asarray, sim.update_camera(cam, act_diag, 0.1))
    assert np.isclose(np.linalg.norm(c4.pos - np.asarray(cam.pos)), 5.0, atol=1e-4)


def test_mouse_look_clamps_pitch():
    cam = sim.init_camera()
    act = Action.idle()._replace(mouse_dy=np.float32(1e6))
    c2 = sim.update_camera(cam, act, 0.016)
    assert float(c2.ver_angle) == 44.0
    act = Action.idle()._replace(mouse_dx=np.float32(100.0))
    c3 = sim.update_camera(cam, act, 0.016)
    assert np.isclose(float(c3.hor_angle), (309.0 + 2.0) % 360.0, atol=1e-4)


def test_controls_time_and_presets():
    st = sim.init_state()
    # automatic advance: 0.5 h/s
    st2 = sim.apply_controls(st, Action.idle(), 2.0)
    assert np.isclose(float(st2.day_time), 7.0, atol=1e-5)
    # paused
    stp = st._replace(play=jnp.bool_(False))
    st3 = sim.apply_controls(stp, Action.idle(), 2.0)
    assert np.isclose(float(st3.day_time), 6.0)
    # scrub x4 overrides pause
    act = Action.idle()._replace(time_control=np.int32(-1))
    st4 = sim.apply_controls(stp, act, 1.0)
    assert np.isclose(float(st4.day_time), 4.0, atol=1e-5)
    # presets
    for key, expect in [(0, 6.0), (1, 14.0), (2, 18.0), (3, 1.0)]:
        stk = sim.apply_controls(st, Action.idle()._replace(time_preset=np.int32(key)), 0.0)
        assert np.isclose(float(stk.day_time), expect)
    # camera preset 6 (mountains view)
    stc = sim.apply_controls(st, Action.idle()._replace(cam_preset=np.int32(1)), 0.0)
    np.testing.assert_allclose(np.asarray(stc.cam.pos), [324.4, 12.41, -84], atol=1e-4)
    assert np.isclose(float(stc.cam.hor_angle), 141.2, atol=1e-4)


def test_controls_sea_and_aa():
    st = sim.init_state()
    st2 = sim.apply_controls(st, Action.idle()._replace(sea_control=np.int32(1)), 0.5)
    assert np.isclose(float(st2.sea_y), -4.5 + 1.0, atol=1e-5)
    st3 = sim.apply_controls(st, Action.idle()._replace(set_aa_off=np.bool_(True)), 0.0)
    assert not bool(st3.aa)
    st4 = sim.apply_controls(st3, Action.idle()._replace(set_aa_on=np.bool_(True)), 0.0)
    assert bool(st4.aa)


def test_animate_recolor_lag():
    """recolorObjects runs before calcSkyVars → recolor_vars trail by a frame."""
    st = sim.init_state()._replace(day_time=jnp.float32(11.0), play=jnp.bool_(False))
    st = st._replace(sky_vars=sim.calc_sky_vars(st.day_time))
    act = Action.idle()._replace(time_preset=np.int32(2))  # jump to 18h
    st2 = sim.animate(st, act, 0.016)
    np.testing.assert_allclose(np.asarray(st2.recolor_vars), np.asarray(st.sky_vars))
    np.testing.assert_allclose(np.asarray(st2.sky_vars),
                               np.asarray(sim.calc_sky_vars(18.0)))


def test_derive_frame(scene):
    st = sim.settle(sim.init_state()._replace(day_time=jnp.float32(14.0)))
    scene2, lights, ambient = jax.tree.map(np.asarray, sim.derive_frame(scene, st))
    # day palette exactly (skyVars = [0,1,0,0] at 14h)
    from raytracing_cuda_tpu.scene import palettes

    np.testing.assert_allclose(ambient, palettes.MAT_AMBIENT[1], atol=1e-6)
    np.testing.assert_allclose(scene2.color[0], palettes.MAT_LAKE[1], atol=1e-6)
    assert np.all(scene2.color[scene2.tree_mask] == palettes.MAT_TREE[1])
    assert np.all(scene2.color[scene2.mount_mask] == palettes.MAT_MOUNT[1])
    # non-recolored objects keep their build colors
    np.testing.assert_allclose(scene2.color[131], [1, 0.8, 0.05], rtol=1e-6)
    # sun/moon proxy spheres track the lights
    np.testing.assert_allclose(scene2.sph_pos[-2:], lights.pos, atol=1e-4)
    np.testing.assert_allclose(scene2.center[131:], lights.pos, atol=1e-4)


def test_format_time():
    assert sim.format_time(6.0) == "06:00"
    assert sim.format_time(14.5) == "14:30"
    assert sim.format_time(23.99) == "23:59"
