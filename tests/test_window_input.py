"""Input-routing tests: the window's key-state → Action mapping
(SURVEY.md §2 #5 — the reference polls Win32 GetAsyncKeyState,
scene.cpp:142-163, 689-756)."""

import numpy as np

from raytracing_cuda_tpu.app.window import poll_action


class _StubPygame:
    """Minimal stand-in for the pygame module: key constants + state."""

    def __init__(self, held=(), rel=(0, 0)):
        names = ("K_a K_b K_d K_e K_o K_p K_q K_s K_v K_w "
                 "K_LSHIFT K_RSHIFT K_LEFT K_RIGHT K_UP K_DOWN "
                 "K_1 K_2 K_3 K_4 K_5 K_6").split()
        for i, n in enumerate(names):
            setattr(self, n, i)
        pressed = [False] * 64
        for n in held:
            pressed[getattr(self, n)] = True
        self.key = type("K", (), {"get_pressed": staticmethod(lambda: pressed)})
        self.mouse = type("M", (), {"get_rel": staticmethod(lambda: rel)})


def test_idle_maps_to_idle():
    a = poll_action(_StubPygame(), grab=True)
    assert int(a.move_side) == 0 and int(a.move_forward) == 0
    assert int(a.time_preset) == -1 and int(a.cam_preset) == -1
    assert not bool(a.run) and not bool(a.set_aa_on)


def test_movement_axes():
    a = poll_action(_StubPygame(held=("K_w", "K_d", "K_q", "K_LSHIFT")), grab=True)
    assert int(a.move_forward) == 1 and int(a.move_side) == 1
    assert int(a.move_up) == 1 and bool(a.run)
    a = poll_action(_StubPygame(held=("K_s", "K_a", "K_e")), grab=True)
    assert int(a.move_forward) == -1 and int(a.move_side) == -1
    assert int(a.move_up) == -1


def test_opposing_keys_cancel():
    a = poll_action(_StubPygame(held=("K_w", "K_s", "K_LEFT", "K_RIGHT")), grab=True)
    assert int(a.move_forward) == 0 and int(a.time_control) == 0


def test_time_and_sea_controls():
    a = poll_action(_StubPygame(held=("K_RIGHT", "K_UP")), grab=True)
    assert int(a.time_control) == 1 and int(a.sea_control) == 1
    a = poll_action(_StubPygame(held=("K_LEFT", "K_DOWN")), grab=True)
    assert int(a.time_control) == -1 and int(a.sea_control) == -1


def test_presets_and_toggles():
    a = poll_action(_StubPygame(held=("K_3", "K_6", "K_b", "K_o", "K_p")), grab=True)
    assert int(a.time_preset) == 2          # key 3 → preset index 2
    assert int(a.cam_preset) == 1           # key 6 → mountains
    assert bool(a.set_aa_on) and bool(a.set_play) and bool(a.set_pause)


def test_mouse_rel_only_when_grabbed():
    a = poll_action(_StubPygame(rel=(7, -3)), grab=True)
    assert float(a.mouse_dx) == 7.0 and float(a.mouse_dy) == -3.0
    a = poll_action(_StubPygame(rel=(7, -3)), grab=False)
    assert float(a.mouse_dx) == 0.0


def test_action_pack_roundtrip():
    from raytracing_cuda_tpu.sim.actions import Action

    a = poll_action(_StubPygame(held=("K_w", "K_2", "K_v"), rel=(5, 2)), grab=True)
    v = a.pack(dt=1 / 30)
    back = Action.unpack(v)
    assert int(back.move_forward) == 1
    assert int(back.time_preset) == 1
    assert bool(back.set_aa_off)
    assert abs(float(Action.unpack_dt(v)) - 1 / 30) < 1e-7
