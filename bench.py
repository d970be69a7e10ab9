#!/usr/bin/env python
"""Benchmark driver for the five BASELINE.json evaluation configs.

Prints ONE JSON line on stdout with the headline metric (sustained FPS on
the animated 1280x720 real-time loop, config 5; baseline target 60 FPS on
one TPU v5e chip). Per-config details go to stderr.

Usage:
  python bench.py                 # full run (1280x720, reference skies if present)
  python bench.py --quick         # small/CI-friendly run
  python bench.py --frames 120 --size 1280x720 --sky procedural
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small resolution smoke run")
    ap.add_argument("--frames", type=int, default=None, help="frames for the sustained loop")
    ap.add_argument("--size", default=None, help="WxH, e.g. 1280x720")
    ap.add_argument("--sky", default="auto", choices=["auto", "reference", "procedural"])
    ap.add_argument("--sky-downsample", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--skip-configs", action="store_true",
                    help="only run the headline sustained loop")
    ap.add_argument("--no-sky-cache", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from raytracing_cuda_tpu.app.loop import Engine
    from raytracing_cuda_tpu.sim import state as sim
    from raytracing_cuda_tpu.sim.actions import Action
    from raytracing_cuda_tpu.utils.config import RenderConfig

    if args.size:
        w, h = (int(v) for v in args.size.lower().split("x"))
    elif args.quick:
        w, h = 480, 272
    else:
        w, h = 1280, 720
    frames = args.frames or (30 if args.quick else 200)
    sky_shape = (256, 512) if args.quick else (2048, 4096)

    cfg = RenderConfig(width=w, height=h, chunk=args.chunk, sky_source=args.sky,
                       sky_downsample=args.sky_downsample,
                       procedural_sky_shape=sky_shape,
                       sky_cache=not args.no_sky_cache)
    log(f"backend={jax.default_backend()} devices={jax.devices()} size={w}x{h} "
        f"frames={frames}")

    eng = Engine(cfg)
    details = {}

    def preset_state(day=None, cam_preset=None, sea=None, aa=True):
        st = sim.init_state()
        if day is not None:
            st = st._replace(day_time=jnp.float32(day))
        if sea is not None:
            st = st._replace(sea_y=jnp.float32(sea))
        if cam_preset is not None:
            st = sim.apply_controls(
                st, Action.idle()._replace(cam_preset=np.int32(cam_preset)), 0.0)
        st = st._replace(aa=jnp.bool_(aa), play=jnp.bool_(False))
        return sim.settle(st)

    from raytracing_cuda_tpu.utils.timing import device_sync

    def time_frames(state, n=10):
        eng.set_state(state)
        device_sync(eng.frame())  # compile + warm
        t0 = time.perf_counter()
        img = None
        for _ in range(n):
            img = eng.frame()
        device_sync(img)
        return (time.perf_counter() - t0) / n

    if not args.skip_configs:
        # 1. Mountains, fixed camera, 640x480, no FXAA — per-frame render
        # time (pipelined over 10 frames; a single synced frame would be
        # dominated by the remote tunnel's ~28 ms round trip)
        eng_small = Engine(RenderConfig(width=640, height=480, chunk=args.chunk,
                                        sky_source=args.sky,
                                        sky_downsample=args.sky_downsample,
                                        procedural_sky_shape=sky_shape))
        from raytracing_cuda_tpu.utils.timing import device_sync as _sync
        eng_small.set_state(preset_state(day=14.0, cam_preset=1, aa=False))
        _sync(eng_small.frame())
        t0 = time.perf_counter()
        img = None
        for _ in range(10):
            img = eng_small.frame()
        _sync(img)
        details["mountains_640x480_noaa_ms"] = round(
            (time.perf_counter() - t0) / 10 * 1e3, 2)
        del eng_small

        # 2. Frozen island sea-level sweep
        sweep_ms = [time_frames(preset_state(cam_preset=0, sea=s), n=5) * 1e3
                    for s in (-4.5, -2.0, 0.0, 2.0)]
        details["island_sea_sweep_ms"] = [round(v, 2) for v in sweep_ms]

        # 3. FXAA on/off at full size
        ms_on = time_frames(preset_state(cam_preset=0, aa=True), n=5) * 1e3
        ms_off = time_frames(preset_state(cam_preset=0, aa=False), n=5) * 1e3
        details["fxaa_on_ms"] = round(ms_on, 2)
        details["fxaa_off_ms"] = round(ms_off, 2)

        # 4. Time-of-day sweep (morning/day/evening/night presets)
        tod = [time_frames(preset_state(day=d, cam_preset=1), n=5) * 1e3
               for d in (6.0, 14.0, 18.0, 1.0)]
        details["time_of_day_ms"] = [round(v, 2) for v in tod]

    # 5. Sustained real-time loop: animated camera + automatic time (headline)
    eng.set_state(sim.settle(sim.init_state()))

    def camera_path(i):
        # smooth scripted pan + slow forward drift, deterministic
        return Action.idle()._replace(
            mouse_dx=np.float32(2.0 * np.sin(i * 0.02)),
            move_forward=np.int32(1 if (i // 60) % 2 == 0 else 0),
        )

    stats = eng.run(frames, action_fn=camera_path, dt=1 / 60, batch=args.batch)
    details["sustained"] = stats.as_dict()
    log(json.dumps(details, indent=2))

    fps = stats.fps
    print(json.dumps({
        "metric": f"sustained_fps_{w}x{h}_animated",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
