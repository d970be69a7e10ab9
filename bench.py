#!/usr/bin/env python
"""Benchmark driver for the five BASELINE.json evaluation configs.

Prints ONE JSON line on stdout with the headline metric (sustained FPS on
the animated 1280x720 real-time loop, config 5; baseline target 60 FPS on
one TPU v5e chip) plus a compiled-path parity gate (RMSE vs 720p oracle
goldens, tests/golden/tpu/, gate < 1e-2 per BASELINE.json). Per-config
details go to stderr.

Methodology notes (docs/PERFORMANCE.md): the remote tunnel adds a ~6 ms
per-dispatch quantum and ~28 ms sync round trips, and drifts ±10% between
sessions — so configs are timed as pipelined loops with end syncs, the
FXAA on/off comparison is an interleaved A/B of the same compiled program,
and the dispatch quantum is estimated separately from batch=1 vs batch=N
sustained runs.

Usage:
  python bench.py                 # full run (1280x720, reference skies if present)
  python bench.py --quick         # small/CI-friendly run
  python bench.py --frames 120 --size 1280x720 --sky procedural
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

PARITY_GATE = 1e-2   # BASELINE.json north-star RMSE contract

SESSION_LOCK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "logs", "tpu_session.lock")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def wait_for_session_lock(lock_path=SESSION_LOCK, wait_s=None, stale_s=None,
                          poll_s=30.0, sleep=time.sleep, clock=time.time):
    """Block while a measurement session holds the TPU.

    The recovery session (experiments/round5_tpu_session.sh) can still be
    mid-tune when the driver's end-of-round bench fires; two programs
    contending on the time-shared tunnel would depress the headline the
    session exists to protect. The session holds `logs/tpu_session.lock`
    (touched around every step), so: wait while the lock exists AND its
    mtime is fresh (< BENCH_SESSION_LOCK_STALE_S, default 2 h — longer
    than the session's 1.5 h per-step timeout, so a live session can't go
    stale between touches), bounded by BENCH_SESSION_LOCK_WAIT_S (default
    3 h). A session that died without cleanup (SIGKILL skips its trap)
    parks the lock until staleness expires — bounded, never forever. The
    session's own bench invocations set BENCH_IGNORE_SESSION_LOCK=1 or
    they would deadlock on their own lock."""
    wait_s = float(os.environ.get("BENCH_SESSION_LOCK_WAIT_S", 3 * 3600)
                   if wait_s is None else wait_s)
    stale_s = float(os.environ.get("BENCH_SESSION_LOCK_STALE_S", 2 * 3600)
                    if stale_s is None else stale_s)
    deadline = clock() + wait_s
    waited = False
    while clock() < deadline:
        try:
            age = clock() - os.path.getmtime(lock_path)
        except OSError:          # lock gone: session finished (or never ran)
            if waited:
                log("session lock released; proceeding")
            return True
        if age > stale_s:
            log(f"session lock is stale ({age:.0f}s > {stale_s:.0f}s) — "
                "treating the session as dead and proceeding")
            return True
        if not waited:
            log(f"measurement session holds {lock_path} (age {age:.0f}s); "
                f"waiting up to {wait_s:.0f}s for it to finish")
            waited = True
        sleep(min(poll_s, max(1.0, deadline - clock())))
    log(f"session lock still held after {wait_s:.0f}s — proceeding anyway")
    return False


def camera_path(i):
    """Config-5 deterministic camera script (smooth pan + slow forward
    drift). Module-level so the A/B harnesses (experiments/ab_batch.py,
    readback_fps.py) measure EXACTLY this workload by importing it."""
    from raytracing_cuda_tpu.sim.actions import Action

    return Action.idle()._replace(
        mouse_dx=np.float32(2.0 * np.sin(i * 0.02)),
        move_forward=np.int32(1 if (i // 60) % 2 == 0 else 0),
    )


def preset_state(day=None, cam_preset=None, sea=None, aa=True, yaw=None):
    from raytracing_cuda_tpu.sim import state as sim
    from raytracing_cuda_tpu.sim.actions import Action

    st = sim.init_state()
    if day is not None:
        st = st._replace(day_time=jnp.float32(day))
    if sea is not None:
        st = st._replace(sea_y=jnp.float32(sea))
    if cam_preset is not None:
        st = sim.apply_controls(
            st, Action.idle()._replace(cam_preset=np.int32(cam_preset)), 0.0)
    if yaw is not None:
        st = st._replace(cam=st.cam._replace(hor_angle=jnp.float32(yaw)))
    st = st._replace(aa=jnp.bool_(aa), play=jnp.bool_(False))
    return sim.settle(st)


def time_frames(eng, state, n=10, warmup=3):
    """Pipelined per-frame seconds: n frames enqueued, one end sync."""
    from raytracing_cuda_tpu.utils.timing import device_sync

    eng.set_state(state)
    for _ in range(warmup):
        device_sync(eng.frame())
    t0 = time.perf_counter()
    img = None
    for _ in range(n):
        img = eng.frame()
    device_sync(img)
    return (time.perf_counter() - t0) / n


def ab_frames(eng, state_a, state_b, n=10, reps=5):
    """Interleaved A/B of eng.frame() under two states → (ms_a, ms_b).

    Alternating timed blocks of the SAME compiled program; medians across
    reps cancel the tunnel's session drift (the only trustworthy comparison
    on this backend — docs/PERFORMANCE.md)."""
    time_frames(eng, state_a, n=2, warmup=2)   # warm both branches
    time_frames(eng, state_b, n=2, warmup=2)
    a, b = [], []
    for _ in range(reps):
        a.append(time_frames(eng, state_a, n=n, warmup=0))
        b.append(time_frames(eng, state_b, n=n, warmup=0))
    return statistics.median(a) * 1e3, statistics.median(b) * 1e3


def _ensure_goldens(w, h):
    """Goldens for (w, h) on disk (oracle renders, CPU backend). The
    canonical 720p set is checked in; other sizes are generated once by
    shelling out to tests/gen_tpu_golden.py under JAX_PLATFORMS=cpu (this
    process owns the axon backend) and cached under tests/golden/tpu/WxH/."""
    import subprocess

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.gen_tpu_golden import CASES_REF, golden_dir
    from tests.test_golden import CASES

    d = golden_dir(w, h)
    want = list(CASES)
    if os.path.exists("/root/reference/backgrounds"):
        want += list(CASES_REF)
    missing = [n for n in want
               if not os.path.exists(os.path.join(d, f"{n}.png"))]
    if missing:
        log(f"parity: generating {len(missing)} oracle goldens at {w}x{h} "
            f"on the CPU backend (one-time, minutes): {missing}")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        # bounded: the child deregisters the remote backend itself
        # (apply_platform), but a hang here must not outlive the driver's
        # patience — oracle renders at large sizes legitimately take
        # minutes on CPU, hence the generous default
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "gen_tpu_golden.py"),
             "--size", f"{w}x{h}"],
            check=True, env=env,
            timeout=float(os.environ.get("GOLDEN_GEN_TIMEOUT", 1800)))
    return d


def parity_check(w, h, sky_shape, chunk, details):
    """Render the golden states through the engine's real compiled path and
    gate RMSE against oracle goldens at the SAME size (VERDICT r1 #2).

    Two golden families: the four procedural-sky states, plus (whenever
    /root/reference/backgrounds exists) two reference-sky states at the full
    8192x4096 panoramas — one mid-crossfade (day = 9.0) so the two-panorama
    truncated-blend resolve is gated end-to-end (VERDICT r2 #3)."""
    from PIL import Image

    from raytracing_cuda_tpu.app.loop import Engine
    from raytracing_cuda_tpu.utils.config import RenderConfig

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # make_state is the SAME function gen_tpu_golden.py rendered the goldens
    # with — the gate must reproduce those states exactly, not re-derive them
    from tests.gen_tpu_golden import CASES_REF
    from tests.test_golden import CASES, make_state

    golden_d = _ensure_goldens(w, h)
    suites = [("procedural", CASES)]
    if os.path.exists("/root/reference/backgrounds"):
        suites.append(("reference", CASES_REF))

    rmses = {}
    for sky_source, cases in suites:
        eng = Engine(RenderConfig(width=w, height=h, chunk=chunk,
                                  sky_source=sky_source,
                                  procedural_sky_shape=sky_shape))
        for name, kw in cases.items():
            golden_path = os.path.join(golden_d, f"{name}.png")
            golden = np.asarray(Image.open(golden_path).convert("RGB"),
                                np.float32)
            eng.set_state(make_state(**kw))
            img = np.asarray(eng.frame(), np.float32)
            rmse = float(np.sqrt(np.mean(((img - golden) / 255.0) ** 2)))
            rmses[name] = round(rmse, 5)
            log(f"parity {name}: rmse={rmse:.5f} "
                f"{'OK' if rmse < PARITY_GATE else '*** FAIL ***'}")
        del eng
    details["parity_rmse"] = rmses
    ok = all(v < PARITY_GATE for v in rmses.values())
    if not ok:
        log("*" * 64)
        log("*** COMPILED-PATH PARITY FAILURE: RMSE above the 1e-2 gate ***")
        log("*" * 64)
    return ok, rmses


# bench.py lives at the repo root next to autotune.json; resolve the file
# relative to THIS file so `python /root/repo/bench.py --tune` from any cwd
# reads/writes the same autotune.json that launch_knobs and the pinning
# tests consult (a cwd-relative open silently forked the two).
AUTOTUNE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "autotune.json")
FLAGSHIP_SIZE = "1280x720"   # the top-level autotune winner's size


def read_autotune() -> dict:
    if os.path.exists(AUTOTUNE_PATH):
        with open(AUTOTUNE_PATH) as f:
            return json.load(f)
    return {}


def write_autotune(full: dict) -> None:
    with open(AUTOTUNE_PATH, "w") as f:
        json.dump(full, f, indent=2)
    # tune results must be visible to launch_knobs IN THIS PROCESS: the
    # multi-size loop builds each size's shipped/split2/no_t_bound arms
    # from the knobs tuned moments earlier
    from raytracing_cuda_tpu.render import pallas_rt
    pallas_rt._AUTOTUNE = None


def merge_autotune(full: dict, out: dict) -> dict:
    """Merge one --tune result into autotune.json's contents.

    Merge, don't clobber: the file also carries the "sky" section
    (--tune-sky) and per-size winners under "sizes" (launch_knobs resolves
    sizes[WxH] → top level → compiled-in defaults, per key). The top level
    is pinned to the FLAGSHIP size (1280x720 — not first-writer-wins, else
    tuning 1080p first on fresh silicon would make every untuned size fall
    back to 1080p knobs and break the defaults pin test); tuning another
    size only updates its "sizes" entry, trimmed to what launch_knobs
    reads plus the winner's provenance (the full sweep telemetry stays at
    the top level for the flagship). Unit-tested (test_render_fast.py) —
    an earlier version of this write path clobbered sibling sections."""
    keep = ("winner", "tile_h", "tile_w", "t_bound", "lane_split",
            "median_ms", "size", "day", "yaw")
    full = dict(full)
    sizes = dict(full.get("sizes", {}))
    sizes[out["size"]] = {k: out[k] for k in keep if k in out}
    top_size = full.get("size")
    if top_size not in (None, FLAGSHIP_SIZE):
        # legacy file written by the old clobbering path with a non-720p
        # top level (e.g. a --quick tune): MOVE those knobs under "sizes" —
        # copy them down, then strip them from the top level, because
        # launch_knobs falls back per KEY to the top level, so knobs left
        # there would keep acting as the de-facto flagship for every
        # unmatched size. The comparison below is against FLAGSHIP_SIZE,
        # never first-writer-wins.
        sizes.setdefault(top_size, {k: full[k] for k in keep if k in full})
        for k in keep + ("all_medians_ms",):
            full.pop(k, None)
        log(f"autotune.json top level was {top_size}, not the flagship "
            f"{FLAGSHIP_SIZE}; moved it under 'sizes'")
    if out["size"] == FLAGSHIP_SIZE:
        full.update(out)
    full["sizes"] = sizes
    return full


def tune(args):
    """One-command launch-config autotune for new silicon (VERDICT r2 #7).

    Sweeps the megakernel's static knobs — (TH, TW) tiles, lane_split,
    t_bound — on the flagship 720p state with the interleaved round-robin
    discipline (every rep times every candidate once, medians across reps
    cancel the tunnel's session drift), then confirms the top-2 with a
    pairwise A/B. Emits the winner as JSON (stdout + autotune.json).
    Each candidate costs one compile (minutes cold, cached after); the
    shipped default (48, 128)/split 1/t_bound on was chosen this way
    (autotune.json carries the committed winner; the kernel's
    DEFAULT_TILE_H/W and test_kernel_defaults_match_autotune track it).
    """
    import itertools

    import jax.numpy as jnp

    from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS,
                                                    build_scene)
    from raytracing_cuda_tpu.sim import state as sim
    from raytracing_cuda_tpu.utils.config import enable_compilation_cache
    from raytracing_cuda_tpu.utils.timing import device_sync

    enable_compilation_cache()
    w, h = (int(v) for v in (args.size or "1280x720").lower().split("x"))
    ths = [int(v) for v in args.tune_th.split(",")]
    tws = [int(v) for v in args.tune_tw.split(",")]

    scene = jax.device_put(build_scene())
    st = preset_state(day=args.tune_day, yaw=args.tune_yaw)
    scene_f, lights, ambient = jax.jit(sim.derive_frame)(scene, st)
    rays = jax.jit(sim.camera_rays, static_argnums=1)(st.cam, w / h)

    def make(th, tw, t_bound, split):
        return jax.jit(lambda: render_base_planes_pallas(
            scene_f, lights, ambient, rays, h, w, tile_h=th, tile_w=tw,
            tri_clusters=ISLAND_TRI_CLUSTERS,
            sph_clusters=ISLAND_SPH_CLUSTERS,
            t_bound=t_bound, lane_split=split))

    def block(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        device_sync(out[0])
        return (time.perf_counter() - t0) / n * 1e3

    # candidate set: tile grid at default split/t_bound, plus split/t_bound
    # variants of the SHIPPED tile (the current kernel defaults — a stale
    # literal here once measured the knobs at the pre-autotune (16, 256))
    from raytracing_cuda_tpu.render.pallas_rt import launch_knobs

    shipped = launch_knobs(h, w)  # this size's shipped knobs (per-size aware)
    cands = {}
    for th, tw in itertools.product(ths, tws):
        if tw % 128:
            continue
        cands[f"tile{th}x{tw}"] = (th, tw, True, 1)
    split_tw = shipped["tile_w"] if shipped["tile_w"] % 256 == 0 else 256
    cands["split2"] = (shipped["tile_h"], split_tw, True, 2)
    cands["no_t_bound"] = (shipped["tile_h"], shipped["tile_w"], False, 1)

    fns = {}
    for name, knobs in cands.items():
        log(f"tune: compiling {name} ...")
        try:
            fn = make(*knobs)
            fn()                      # compile + smoke
            fns[name] = fn
        except Exception as e:        # a knob the backend rejects is a
            log(f"tune: {name} failed to compile/run: {e}")   # data point
    for fn in fns.values():
        block(fn, 2)                  # warm

    if not fns:
        raise SystemExit("tune: no candidate compiled and ran — check the "
                         "backend (Mosaic kernels need a TPU; see the "
                         "per-candidate errors above)")
    times = {n: [] for n in fns}
    for r in range(args.tune_reps):
        for name, fn in fns.items():  # round-robin: drift hits all equally
            times[name].append(block(fn, args.tune_n))
        log(f"tune rep {r}: " + "  ".join(
            f"{n}={times[n][-1]:.2f}" for n in fns))
    med = {n: statistics.median(v) for n, v in times.items()}
    ranked = sorted(med, key=med.get)
    log("tune ranking: " + "  ".join(f"{n}={med[n]:.2f}ms" for n in ranked))

    # pairwise confirm of the top two
    if len(ranked) >= 2:
        a, b = ranked[0], ranked[1]
        A, B = [], []
        for _ in range(args.tune_reps):
            A.append(block(fns[a], args.tune_n))
            B.append(block(fns[b], args.tune_n))
        log(f"tune confirm: {a}={statistics.median(A):.2f}ms "
            f"{b}={statistics.median(B):.2f}ms")
        if statistics.median(B) < statistics.median(A):
            ranked[0], ranked[1] = ranked[1], ranked[0]

    th, tw, t_bound, split = cands[ranked[0]]
    out = {"winner": ranked[0], "tile_h": th, "tile_w": tw,
           "t_bound": t_bound, "lane_split": split,
           "median_ms": round(med[ranked[0]], 3),
           "all_medians_ms": {n: round(v, 3) for n, v in med.items()},
           "size": f"{w}x{h}", "day": args.tune_day, "yaw": args.tune_yaw}
    write_autotune(merge_autotune(read_autotune(), out))
    print(json.dumps(out))


def tune_sky(args):
    """Sky-resolve knob autotune — the resolve counterpart of --tune.

    The grouped resolve's knobs (textures.SKY_SELECT / SKY_ANCHOR /
    SKY_LAYOUT / SKY_PASSES) all have measured winners on THIS tunnel
    (docs/PERFORMANCE.md); like the tile optimum, they may move on
    dedicated silicon. Each candidate flips ONE knob from shipped and
    times the full static-sky frame (kernel + resolve + FXAA) at a
    pure-band AND an in-fade state (the extra gather + window blend only
    exists inside fades), interleaved round-robin, ranked on the summed
    medians. Knobs are read at trace time, so each candidate traces and
    compiles inside its knob scope. Results land under the "sky" key of
    autotune.json (the tile section is untouched).
    """
    import raytracing_cuda_tpu.scene.textures as tex
    from raytracing_cuda_tpu.render.pipeline import render_frame_static_sky
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS,
                                                    ISLAND_TRI_SUBS,
                                                    build_scene)
    from raytracing_cuda_tpu.scene.textures import load_skies, sky_static_init
    from raytracing_cuda_tpu.utils.config import enable_compilation_cache
    from raytracing_cuda_tpu.utils.timing import device_sync

    enable_compilation_cache()
    w, h = (int(v) for v in (args.size or "1280x720").lower().split("x"))
    scene = jax.device_put(build_scene())
    sky = load_skies(args.sky, downsample=args.sky_downsample)
    texels = jax.device_put(jnp.asarray(sky.texels))
    sh, sw = texels.shape[1], texels.shape[2]
    stack = jax.jit(sky_static_init)(texels)
    states = {"pure": preset_state(day=args.tune_day, yaw=args.tune_yaw),
              "fade": preset_state(day=9.0, yaw=args.tune_yaw)}

    CANDS = {
        "shipped": {},
        "select_onehot": {"SKY_SELECT": "onehot"},
        "layout_flat": {"SKY_LAYOUT": "flat"},
        "passes3": {"SKY_PASSES": 3},
        "anchor_mean": {"SKY_ANCHOR": "mean"},
        "anchor_minpix": {"SKY_ANCHOR": "minpix"},
    }
    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, t_subs=ISLAND_TRI_SUBS,
              # escape hatch for off-TPU smoke of the WHOLE flow (ranking,
              # autotune.json); timings are meaningless in interpret mode
              interpret=bool(os.environ.get("BENCH_TUNE_INTERPRET")))

    fns = {}
    for name, knobs in CANDS.items():
        # flip relative to the SHIPPED defaults, not the live module state:
        # a previously-committed tune overrides the module knobs at import
        # (textures._apply_tuned_sky_knobs), so flipping from the live
        # state would turn the "shipped" arm into "previously tuned" and
        # make the tune a one-way ratchet (a default that lost once could
        # never win again on new silicon)
        saved = {k: getattr(tex, k) for k in tex.SHIPPED_SKY_KNOBS}
        for k, v in {**tex.SHIPPED_SKY_KNOBS, **knobs}.items():
            setattr(tex, k, v)
        log(f"tune-sky: compiling {name} ...")
        try:
            # the stack MUST ride as an argument, not a closure: a closed-
            # over pack bakes ~2.15 GB of constants into the program, which
            # the remote AOT toolchain rejects outright (HTTP 413 request-
            # size limit — observed 2026-08-18, every candidate failed)
            fn = jax.jit(lambda s, stk: render_frame_static_sky(
                scene, s, stk, sh, sw, h, w, **kw))
            for s in states.values():
                fn(s, stack)          # trace+compile INSIDE the knob scope
            fns[name] = fn
        except Exception as e:
            log(f"tune-sky: {name} failed to compile/run: {e}")
        finally:
            for k, v in saved.items():
                setattr(tex, k, v)

    if not fns:
        raise SystemExit("tune-sky: no candidate compiled and ran")

    def block(fn, s, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(s, stack)
        device_sync(out)
        return (time.perf_counter() - t0) / n * 1e3

    for fn in fns.values():
        for s in states.values():
            block(fn, s, 2)           # warm
    times = {n: {b: [] for b in states} for n in fns}
    for r in range(args.tune_reps):
        for name, fn in fns.items():  # round-robin: drift hits all equally
            for band, s in states.items():
                times[name][band].append(block(fn, s, args.tune_n))
        log(f"tune-sky rep {r}: " + "  ".join(
            f"{n}={times[n]['pure'][-1]:.2f}/{times[n]['fade'][-1]:.2f}"
            for n in fns))
    med = {n: {b: statistics.median(v) for b, v in bands.items()}
           for n, bands in times.items()}
    ranked = sorted(med, key=lambda n: med[n]["pure"] + med[n]["fade"])
    log("tune-sky ranking (pure+fade ms): " + "  ".join(
        f"{n}={med[n]['pure']:.2f}+{med[n]['fade']:.2f}" for n in ranked))

    # "resolved" = the full knob set the winner implies: the COMPILED-IN
    # shipped defaults + the winning flip (not the live module state,
    # which may carry a previous tune's override) —
    # test_sky_defaults_match_autotune pins textures.py to it, the
    # test_kernel_defaults_match_autotune pattern
    resolved = {**tex.SHIPPED_SKY_KNOBS, **CANDS[ranked[0]]}
    out = {"winner": ranked[0], "knobs": CANDS[ranked[0]],
           "resolved": resolved,
           "medians_ms": {n: {b: round(v, 3) for b, v in bands.items()}
                          for n, bands in med.items()},
           "size": f"{w}x{h}", "sky": f"{sh}x{sw}", "day": args.tune_day}
    full = read_autotune()
    full["sky"] = out
    write_autotune(full)
    print(json.dumps({"sky_tune": out}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small resolution smoke run")
    ap.add_argument("--frames", type=int, default=None, help="frames for the sustained loop")
    ap.add_argument("--size", default=None,
                    help="WxH, e.g. 1280x720 (with --tune: comma list "
                         "retunes each size in turn)")
    ap.add_argument("--sky", default="auto", choices=["auto", "reference", "procedural"])
    ap.add_argument("--sky-downsample", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--skip-configs", action="store_true",
                    help="only run the headline sustained loop")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--no-sky-cache", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tune", action="store_true",
                    help="autotune megakernel launch knobs (tiles, "
                         "lane_split, t_bound) and emit autotune.json")
    # 24 and 40 divide 1080 and 480 exactly (zero pad rows); 48 is the
    # committed 720p winner and its proven neighbors bracket it
    ap.add_argument("--tune-th", default="8,16,24,32,40,48,64")
    ap.add_argument("--tune-tw", default="128,256,512")
    ap.add_argument("--tune-reps", type=int, default=5)
    ap.add_argument("--tune-n", type=int, default=10)
    ap.add_argument("--tune-day", type=float, default=14.0)
    ap.add_argument("--tune-yaw", type=float, default=None,
                    help="tune on a specific pose (e.g. the worst-state "
                         "probe's day 17.6 / yaw 315)")
    ap.add_argument("--tune-sky", action="store_true",
                    help="autotune the sky-resolve knobs (SKY_SELECT/"
                         "ANCHOR/LAYOUT/PASSES) on full frames at a "
                         "pure-band + in-fade state; writes the 'sky' "
                         "section of autotune.json")
    args = ap.parse_args()

    # sitecustomize consumes JAX_PLATFORMS at interpreter startup —
    # re-apply an explicit user choice (same helper as the CLI and the
    # golden generator), so `JAX_PLATFORMS=cpu python bench.py` really is
    # a CPU smoke (and works during tunnel outages: the helper also
    # deregisters the remote backend factory when axon isn't requested)
    from raytracing_cuda_tpu.utils.config import apply_env_platform

    apply_env_platform()

    # Wedge retry: a wedged tunnel at bench time costs the round its
    # driver-captured headline (BENCH_r03 AND BENCH_r04 were error records —
    # the tunnel happened to be down the minute the driver ran). Probe the
    # backend in a SUBPROCESS (in-process, client creation blocks forever
    # and taints the interpreter: the blocked init holds the backend slot)
    # and retry inside a bounded budget before giving up. The default is
    # HOURS, not minutes: observed outages last multi-hour to half-day
    # (CLAUDE.md), so a 15-minute window was noise against that
    # distribution — a bench that lands mid-outage should survive a late
    # recovery rather than hand the round another error record.
    if "axon" in os.environ.get("JAX_PLATFORMS", "axon"):
        import subprocess
        budget = float(os.environ.get("BENCH_BACKEND_RETRY_S", 3 * 3600))
        probe_t = float(os.environ.get("BENCH_BACKEND_PROBE_TIMEOUT_S", 150))
        deadline = time.time() + budget
        attempt = 0
        while True:
            attempt += 1
            try:
                # cap each probe by the remaining budget so the total wait
                # can't overshoot BENCH_BACKEND_RETRY_S by a probe length
                this_t = min(probe_t, max(10.0, deadline - time.time()))
                # platform guard: an axon plugin that fails FAST (registration
                # error, not a hang) falls back to CPU devices — that must
                # read as failure, not recovery, or bench would "measure"
                # the five configs on the CPU and emit a garbage headline
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; d = jax.devices()\n"
                     "assert d and d[0].platform != 'cpu', d\n"
                     "print('BENCH-PROBE-OK', len(d), d[0].platform)"],
                    timeout=this_t, capture_output=True, text=True)
                if r.returncode == 0 and "BENCH-PROBE-OK" in r.stdout:
                    if attempt > 1:
                        log(f"backend probe recovered on attempt {attempt}")
                    break
                log(f"backend probe attempt {attempt}: rc={r.returncode} "
                    f"{(r.stderr or '').strip()[-200:]}")
            except subprocess.TimeoutExpired:
                log(f"backend probe attempt {attempt}: timed out "
                    "(wedged tunnel signature)")
            if time.time() + 45 >= deadline:
                log("FATAL: backend never came up within "
                    f"BENCH_BACKEND_RETRY_S={budget:.0f}s "
                    f"({attempt} probe attempts) — the remote TPU tunnel "
                    "is wedged (see CLAUDE.md). Retry later or run with "
                    "JAX_PLATFORMS=cpu for a smoke.")
                print(json.dumps({
                    "metric": "error", "value": 0, "unit": "none",
                    "vs_baseline": 0,
                    "error": "backend wedged (devices() timeout)",
                    "probe_attempts": attempt,
                    "retry_budget_s": budget}))
                sys.exit(1)
            time.sleep(45)

        # Don't contend with a live recovery-session on the shared TPU.
        # Checked AFTER the probe succeeds, not before the retry loop:
        # recovery is precisely the moment both this bench and the
        # watcher-fired session wake up, so a pre-loop check would miss a
        # session that started mid-retry. Then CLAIM the lock for our own
        # measurement window — the session script polls the same lock
        # before claiming, so a session fired while we measure waits for
        # us (we remove it at exit; a killed bench leaves it to the
        # session's 45-min foreign-lock staleness). The session's own
        # bench steps set BENCH_IGNORE_SESSION_LOCK=1: they skip both the
        # wait (self-deadlock) and the claim (the exit-removal would
        # delete the session's lock mid-session).
        if os.environ.get("BENCH_IGNORE_SESSION_LOCK") != "1":
            wait_for_session_lock()
            import atexit
            import threading as _th
            os.makedirs(os.path.dirname(SESSION_LOCK), exist_ok=True)
            open(SESSION_LOCK, "w").close()
            atexit.register(lambda: os.path.exists(SESSION_LOCK)
                            and os.remove(SESSION_LOCK))

            # Keep the claim FRESH while we run: a cold-cache bench can
            # exceed the session's 45-min staleness cutoff, and a stale
            # lock would let the session start mid-measurement. Daemon
            # thread → dies with the process, so a killed bench stops
            # touching and staleness correctly frees the session.
            def _touch_lock():
                while True:
                    time.sleep(300)
                    try:
                        os.utime(SESSION_LOCK)
                    except OSError:
                        return
            _th.Thread(target=_touch_lock, daemon=True).start()

    # Backend watchdog: the remote tunnel can wedge outright (axon client
    # creation blocks forever — observed 2026-08-17, >1 h). A bench that
    # hangs is worse than one that fails: bound the first backend touch
    # and exit with a diagnostic instead. (Kept even after the subprocess
    # probe above: the tunnel can wedge BETWEEN probe and first touch.)
    import threading

    _ready = threading.Event()
    _dev, _err = [], []

    def _probe():
        try:
            _dev.extend(jax.devices())
        except Exception as e:        # fast failure ≠ wedge: report it now
            _err.append(e)
        finally:
            _ready.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not _ready.wait(float(os.environ.get("BENCH_BACKEND_TIMEOUT", 300))):
        log("FATAL: jax.devices() did not return within the backend "
            "timeout — the remote TPU tunnel is wedged (see CLAUDE.md). "
            "Retry later or run with JAX_PLATFORMS=cpu for a smoke.")
        print(json.dumps({"metric": "error", "value": 0, "unit": "none",
                          "vs_baseline": 0,
                          "error": "backend wedged (devices() timeout)"}))
        sys.exit(1)
    if _err:
        log(f"FATAL: backend initialization failed: {_err[0]!r}")
        print(json.dumps({"metric": "error", "value": 0, "unit": "none",
                          "vs_baseline": 0,
                          "error": f"backend init failed: {_err[0]}"}))
        sys.exit(1)
    log(f"backend: {_dev}")

    if args.tune_sky:
        tune_sky(args)
        return
    if args.tune:
        # --size takes a comma list here (e.g. 1280x720,1920x1080,640x480):
        # one command retunes every size; non-flagship winners land under
        # autotune.json "sizes" (launch_knobs resolves per size)
        for size in (args.size or "1280x720").split(","):
            args.size = size
            tune(args)
        return

    from raytracing_cuda_tpu.app.loop import Engine
    from raytracing_cuda_tpu.sim import state as sim
    from raytracing_cuda_tpu.sim.actions import Action
    from raytracing_cuda_tpu.utils.config import RenderConfig
    from raytracing_cuda_tpu.utils.timing import device_sync

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
        f"frames={frames} batch={args.batch}")

    eng = Engine(cfg)
    details = {}

    if not args.skip_configs:
        # 1. Mountains, fixed camera, 640x480, no FXAA — pipelined per-frame
        # render time (a single synced frame would be dominated by the
        # remote tunnel's ~28 ms round trip)
        eng_small = Engine(RenderConfig(width=640, height=480, chunk=args.chunk,
                                        sky_source=args.sky,
                                        sky_downsample=args.sky_downsample,
                                        procedural_sky_shape=sky_shape))
        ms = time_frames(eng_small, preset_state(day=14.0, cam_preset=1, aa=False),
                         n=10, warmup=3) * 1e3
        details["mountains_640x480_noaa_ms"] = round(ms, 2)
        del eng_small

        # 2. Frozen island sea-level sweep (same compiled program, sea_y is
        # a traced scalar). Interleaved reps with a per-level median — the
        # same discipline as the FXAA A/B (config 3): a min-of-passes dodged
        # residual warm-up but overstated stability (VERDICT r2 weak #4);
        # interleaving cancels the tunnel's session drift instead. Levels
        # need not be flat — culling makes the exposed island genuinely
        # costlier than the flooded one.
        levels = (-4.5, -2.0, 0.0, 2.0)
        states = [preset_state(cam_preset=0, sea=s) for s in levels]
        for st in states:                       # warm every level once
            time_frames(eng, st, n=2, warmup=2)
        sweep = [[] for _ in levels]
        for _ in range(3):
            for i, st in enumerate(states):
                sweep[i].append(time_frames(eng, st, n=10, warmup=0) * 1e3)
        details["island_sea_sweep_ms"] = [round(statistics.median(v), 2)
                                          for v in sweep]

        # 3. FXAA on/off at full size — interleaved A/B (the ~2 ms FXAA pass
        # is smaller than the tunnel's session drift, so only alternating
        # blocks of the same program resolve it)
        ms_on, ms_off = ab_frames(eng, preset_state(cam_preset=0, aa=True),
                                  preset_state(cam_preset=0, aa=False),
                                  n=10, reps=5)
        details["fxaa_on_ms"] = round(ms_on, 2)
        details["fxaa_off_ms"] = round(ms_off, 2)
        details["fxaa_cost_ms"] = round(ms_on - ms_off, 2)

        # 4. Time-of-day sweep (morning/day/evening/night presets)
        tod = [time_frames(eng, preset_state(day=d, cam_preset=1), n=10) * 1e3
               for d in (6.0, 14.0, 18.0, 1.0)]
        details["time_of_day_ms"] = [round(v, 2) for v in tod]

        # 4b. Crossfade sustained window (VERDICT r2 #1): the playing clock
        # crosses the 8-10 h morning→day fade, so EVERY frame blends two
        # panoramas (the static-stack pair resolve's two-gather branch —
        # the round-2 cached design re-packed the full panorama here at
        # +15.7 ms/frame). Must hold the 60 fps target like the pure bands.
        n_fade = min(frames, 200)
        eng.set_state(sim.settle(sim.init_state()._replace(
            day_time=jnp.float32(8.05))))
        stats_fade = eng.run(n_fade, action_fn=camera_path, dt=1 / 60)
        details["crossfade_sustained_fps"] = round(stats_fade.fps, 2)

        # 4c. Pinned worst case (VERDICT r2 #2): the (day x yaw) probe
        # (experiments/worst_state_probe.py, 2026-08-17) found the frame
        # maximum at day 17.6, yaw 315 deg — the island pose where the most
        # geometry + sea reflections fill the frame AND near-horizontal
        # shadow rays sweep the mountain ring. Frozen state, pipelined
        # frame time; this is the fps floor the soak's low windows hit.
        ms = time_frames(eng, preset_state(day=17.6, yaw=315.0), n=10,
                         warmup=3) * 1e3
        details["low_sun_worst_ms"] = round(ms, 2)
        details["low_sun_worst_fps"] = round(1e3 / ms, 2)

    # 5. Sustained real-time loop: animated camera + automatic time (headline)
    eng.set_state(sim.settle(sim.init_state()))
    stats = eng.run(frames, action_fn=camera_path, dt=1 / 60, batch=args.batch)
    details["sustained"] = stats.as_dict()

    # alternate dispatch mode + quantum estimate: batch=1 (the default —
    # pipelined per-frame dispatches, measured faster: interleaved A/B
    # 72.97 vs 64.44 fps, experiments/ab_batch.py) vs a batch=16 lax.scan
    # per dispatch. quantum ≈ (t1-tB)/(1-1/B); ≤0 means pipelining already
    # hides the per-dispatch cost and the scan carry is pure overhead.
    if not args.skip_configs and frames >= max(16, args.batch):
        alt = 16 if args.batch == 1 else 1
        B = max(alt, args.batch)
        # EQUAL-length runs, whole multiples of the scan batch, both fresh —
        # the headline run can't serve as one side (it may contain remainder
        # single-frame steps, and a different frame count amortizes the one
        # ~28 ms end sync differently). Drift still applies; the estimate is
        # indicative, the interleaved ab_batch.py harness is the verdict.
        n1 = min(64, frames) // B * B
        eng.set_state(sim.settle(sim.init_state()))
        stats_alt = eng.run(n1, action_fn=camera_path, dt=1 / 60, batch=alt)
        eng.set_state(sim.settle(sim.init_state()))
        stats_base = eng.run(n1, action_fn=camera_path, dt=1 / 60,
                             batch=args.batch)
        details[f"sustained_batch{alt}_fps"] = round(stats_alt.fps, 2)
        if args.batch == 1:
            t_1, t_b = 1e3 / stats_base.fps, 1e3 / stats_alt.fps
        else:
            t_1, t_b = 1e3 / stats_alt.fps, 1e3 / stats_base.fps
        details["dispatch_quantum_ms_est"] = round(
            (t_1 - t_b) / (1.0 - 1.0 / B), 2)

    # 6. compiled-path parity gate vs oracle goldens at the invoked size
    # (procedural + reference-sky suites; non-720p goldens generate once on
    # the CPU backend — VERDICT r2 #3 closed the 720p-only skip)
    parity_ok = True
    rmses = {}
    if not args.skip_parity and not args.quick:
        parity_ok, rmses = parity_check(w, h, sky_shape, args.chunk, details)

    log(json.dumps(details, indent=2))

    fps = stats.fps
    out = {
        "metric": f"sustained_fps_{w}x{h}_animated",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }
    if "crossfade_sustained_fps" in details:
        out["crossfade_fps"] = details["crossfade_sustained_fps"]
    if rmses:
        out["parity_rmse_max"] = max(rmses.values())
        out["parity_ok"] = parity_ok
    print(json.dumps(out))


if __name__ == "__main__":
    main()
