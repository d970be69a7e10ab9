"""Generate full-resolution parity goldens for bench.py's compiled-TPU gate.

Renders golden states through the ORACLE path on the CPU backend and stores
them as PNGs under tests/golden/tpu/ (canonical 1280x720) or
tests/golden/tpu/{W}x{H}/ (other sizes). Two golden families:

  * the four procedural-sky states (CASES, deterministic 2048x4096
    procedural sky — standalone, no reference assets needed);
  * two reference-sky states (CASES_REF, the real 8192x4096 panoramas from
    /root/reference/backgrounds — one of them mid-crossfade, day = 9.0, so
    the two-panorama truncated blend path itself is gated end-to-end).

bench.py renders the same states through the engine's real compiled TPU
path and gates the RMSE against these frames (< 1e-2, BASELINE.json's
north-star contract); when invoked at a size with no goldens on disk it
shells out to this script (JAX_PLATFORMS=cpu) to build them.

Run directly only when render semantics change intentionally:
  JAX_PLATFORMS=cpu python tests/gen_tpu_golden.py [--size WxH]
      [--sky procedural|reference|both]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_cuda_tpu.utils.config import apply_platform

# force CPU *and* deregister the remote backend factory — the config update
# alone would still let backends() create the (possibly wedged) axon client
apply_platform("cpu")

import numpy as np

TPU_GOLDEN_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "golden", "tpu")
H, W = 720, 1280
SKY_SHAPE = (2048, 4096)

# reference-sky golden states (day=9.0 is mid morning→day crossfade)
CASES_REF = {
    "ref_island_fade": dict(day=9.0),
    "ref_mountains_day": dict(day=14.0, cp=1),
}


def golden_dir(w: int, h: int) -> str:
    d = TPU_GOLDEN_ROOT if (w, h) == (W, H) else os.path.join(
        TPU_GOLDEN_ROOT, f"{w}x{h}")
    os.makedirs(d, exist_ok=True)
    return d


def generate(w: int, h: int, sky_kind: str, only_missing: bool = True):
    """Render oracle goldens at (w, h) for the given sky family."""
    import jax.numpy as jnp

    from raytracing_cuda_tpu.render.pipeline import render_frame
    from raytracing_cuda_tpu.scene.builders import build_scene
    from raytracing_cuda_tpu.scene.textures import (REFERENCE_BACKGROUNDS,
                                                    load_reference_skies,
                                                    procedural_skies)
    from raytracing_cuda_tpu.utils.images import save_png
    from tests.test_golden import CASES, make_state

    scene = build_scene()
    out_dir = golden_dir(w, h)
    if sky_kind == "procedural":
        sky, cases = jnp.asarray(procedural_skies(*SKY_SHAPE)), CASES
    else:
        if not os.path.exists(REFERENCE_BACKGROUNDS):
            print("reference backgrounds absent; skipping ref goldens",
                  flush=True)
            return
        sky, cases = jnp.asarray(load_reference_skies()), CASES_REF
    for name, kw in cases.items():
        path = os.path.join(out_dir, f"{name}.png")
        if only_missing and os.path.exists(path):
            continue
        img = np.asarray(render_frame(scene, make_state(**kw), sky, h, w,
                                      chunk=32768, path="oracle"))
        save_png(img, path)
        print(f"{name} ({w}x{h}, {sky_kind}): mean={float(img.mean()):.2f}",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default=f"{W}x{H}")
    ap.add_argument("--sky", default="both",
                    choices=["procedural", "reference", "both"])
    ap.add_argument("--force", action="store_true",
                    help="regenerate even if the PNGs exist")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.lower().split("x"))
    kinds = (["procedural", "reference"] if args.sky == "both"
             else [args.sky])
    for kind in kinds:
        generate(w, h, kind, only_missing=not args.force)
