"""Per-frame input actions.

The reference polls Win32 key state every frame (GetAsyncKeyState,
scene.cpp:142-163 and 689-756). Here input arrives as a plain pytree of
held-key values so the same pure step function serves interactive windows,
scripted benchmark drivers, and tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np


class Action(NamedTuple):
    """One frame of input. Integer fields are -1/0/+1 'axis' values."""

    move_side: jax.Array     # D - A            (scene.cpp:149)
    move_forward: jax.Array  # W - S            (scene.cpp:151)
    move_up: jax.Array       # Q - E            (scene.cpp:153)
    run: jax.Array           # bool: shift held (scene.cpp:156)
    mouse_dx: jax.Array      # pixels since last frame (mouseMotion)
    mouse_dy: jax.Array
    time_control: jax.Array  # RIGHT - LEFT     (scene.cpp:691)
    set_play: jax.Array      # bool: P held     (scene.cpp:700)
    set_pause: jax.Array     # bool: O held     (scene.cpp:703)
    sea_control: jax.Array   # UP - DOWN        (scene.cpp:708)
    time_preset: jax.Array   # int: -1 none, 0..3 = keys 1/2/3/4 (scene.cpp:713-728)
    cam_preset: jax.Array    # int: -1 none, 0 = key 5 island, 1 = key 6 mountains
    set_aa_on: jax.Array     # bool: B held     (scene.cpp:750)
    set_aa_off: jax.Array    # bool: V held     (scene.cpp:753)

    @staticmethod
    def idle() -> "Action":
        """No keys held, no mouse motion."""
        z = np.int32(0)
        f = np.bool_(False)
        return Action(
            move_side=z, move_forward=z, move_up=z, run=f,
            mouse_dx=np.float32(0), mouse_dy=np.float32(0),
            time_control=z, set_play=f, set_pause=f, sea_control=z,
            time_preset=np.int32(-1), cam_preset=np.int32(-1),
            set_aa_on=f, set_aa_off=f,
        )
