#!/usr/bin/env python
"""Host-side engagement probe for the below-horizon light cull (hcull).

Before spending TPU time on the interleaved A/B, answer on the CPU: at a
pose, per (tile_h, tile_w) kernel tile and per light, how many tiles have
any lane needing the light's occlusion sweeps (`any_need` — the shipped
gate), and how many of those the hcull plane-kill test would skip? The
tile counts bound the attainable win: hcull can only remove the needy
tiles it kills, and only for the below-horizon light.

Bounce-0 only (reflection bounces shift hit points, but the primary pass
dominates tile liveness). Uses the oracle's machinery, so the numbers are
exact for level 0.

  JAX_PLATFORMS=cpu python experiments/hcull_probe.py --day 17.6 --yaw 315
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_cuda_tpu.utils.config import apply_env_platform

apply_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.core.types import SPHERE
from raytracing_cuda_tpu.ops.intersect import nearest_hit
from raytracing_cuda_tpu.render.reference import primary_rays
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.core.math3d import normalize as _normalize

f32 = jnp.float32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--day", type=float, default=17.6)
    ap.add_argument("--yaw", type=float, default=315.0)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--tile", default=None,
                    help="THxTW (default: launch_knobs for the size)")
    args = ap.parse_args()

    w, h = (int(v) for v in args.size.split("x"))
    if args.tile:
        th, tw = (int(v) for v in args.tile.split("x"))
    else:
        from raytracing_cuda_tpu.render.pallas_rt import launch_knobs
        k = launch_knobs(h, w)
        th, tw = k["tile_h"], k["tile_w"]

    scene = build_scene()
    from bench import preset_state
    st = preset_state(day=args.day, yaw=args.yaw)
    scene_f, lights, ambient = sim.derive_frame(scene, st)
    cam = sim.camera_rays(st.cam, w / h)
    d = primary_rays(cam, h, w)
    o = jnp.broadcast_to(jnp.asarray(st.cam.pos, f32), d.shape)

    hit_any, t, gidx = nearest_hit(scene_f, o, d)
    g = jnp.maximum(gidx, 0)
    hit_pos = o + d * t[..., None]
    normal = jnp.where((scene_f.obj_type[g] == SPHERE)[..., None],
                       _normalize(hit_pos - scene_f.center[g]),
                       scene_f.static_normal[g])
    emissive = scene_f.is_light[g]
    shaded = hit_any & jnp.logical_not(emissive)
    sea_y = float(st.sea_y)

    hp = max(1, h // th) * th
    if hp < h:
        hp += th
    # pad rows like the kernel does (pad rays miss -> need 0 there)
    print(f"pose day={args.day} yaw={args.yaw} size={w}x{h} "
          f"tile=({th},{tw}) sea_y={sea_y}")
    for li in range(2):
        lpos = np.asarray(lights.pos[li])
        lvec = lights.pos[li] - hit_pos
        sdist = jnp.sqrt(jnp.sum(lvec * lvec, axis=-1))
        sdir = lvec / sdist[..., None]
        angle = jnp.sum(normal * sdir, axis=-1)
        need = np.asarray(shaded & (angle > 0), np.float32)
        hy = np.asarray(hit_pos[..., 1], np.float32)
        msdy = np.asarray(-sdir[..., 1], np.float32)

        # tile reductions (crop to full tiles: edge tiles are padded rays
        # in the real kernel and behave the same)
        H2, W2 = (h // th) * th, (w // tw) * tw
        nt = need[:H2, :W2].reshape(h // th, th, w // tw, tw)
        hyt = hy[:H2, :W2].reshape(h // th, th, w // tw, tw)
        myt = msdy[:H2, :W2].reshape(h // th, th, w // tw, tw)
        any_need = nt.max(axis=(1, 3)) > 0
        big = np.float32(1e30)
        min_hy = np.where(nt > 0, hyt, big).min(axis=(1, 3))
        min_my = np.where(nt > 0, myt, big).min(axis=(1, 3))
        kill = ((lpos[1] < sea_y) & (min_hy > sea_y + 0.001)
                & (min_my > 0.0032))
        needy = int(any_need.sum())
        killed = int((kill & any_need).sum())
        total = any_need.size
        print(f"light {li}: y={lpos[1]:+.1f} needy tiles {needy}/{total} "
              f"({100 * needy / total:.0f}%), hcull kills {killed} "
              f"({100 * killed / max(needy, 1):.0f}% of needy)")


if __name__ == "__main__":
    main()
