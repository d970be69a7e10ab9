"""Generate full-resolution parity goldens for bench.py's compiled-TPU gate.

Renders the four golden states at 1280x720 through the ORACLE path on the
CPU backend with the deterministic procedural sky (2048x4096 — standalone,
no reference assets needed), and stores them as PNGs under
tests/golden/tpu/. bench.py renders the same states through the engine's
real compiled TPU path and gates the RMSE against these frames (< 1e-2,
BASELINE.json's north-star contract).

Run only when render semantics change intentionally:
  JAX_PLATFORMS=cpu python tests/gen_tpu_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from raytracing_cuda_tpu.render.pipeline import render_frame
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.scene.textures import procedural_skies
from raytracing_cuda_tpu.utils.images import save_png
from tests.test_golden import CASES, GOLDEN_DIR, make_state

TPU_GOLDEN_DIR = os.path.join(GOLDEN_DIR, "tpu")
H, W = 720, 1280
SKY_SHAPE = (2048, 4096)

if __name__ == "__main__":
    scene = build_scene()
    sky = jnp.asarray(procedural_skies(*SKY_SHAPE))
    os.makedirs(TPU_GOLDEN_DIR, exist_ok=True)
    for name, kw in CASES.items():
        img = np.asarray(render_frame(scene, make_state(**kw), sky, H, W,
                                      chunk=32768, path="oracle"))
        save_png(img, os.path.join(TPU_GOLDEN_DIR, f"{name}.png"))
        print(name, float(img.mean()), flush=True)
