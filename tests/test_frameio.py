"""Native frame-output runtime tests (native/frameio via ctypes).

Builds libframeio.so in-tree if missing (g++, dependency-free) and checks
the PNG encoder bit-exactly against PIL's decoder, plus the async writer's
ring/drain semantics.
"""

import os

import numpy as np
import pytest

from raytracing_cuda_tpu.utils import frameio

if not frameio.available():
    built = frameio.build()
    if not built:
        pytest.skip("no C++ toolchain to build libframeio", allow_module_level=True)


def test_png_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (37, 61, 3)).astype(np.uint8)  # odd dims
    p = str(tmp_path / "x.png")
    frameio.write_png(img, p)
    back = np.asarray(Image.open(p).convert("RGB"))
    assert np.array_equal(back, img)


def test_async_writer_writes_all(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (16, 24, 3)).astype(np.uint8) for _ in range(8)]
    with frameio.AsyncFrameWriter(ring=3) as w:
        for i, f in enumerate(frames):
            w.submit(f, str(tmp_path / f"{i}.png"))
        w.drain()
        assert w.written == 8
    for i, f in enumerate(frames):
        back = np.asarray(Image.open(str(tmp_path / f"{i}.png")).convert("RGB"))
        assert np.array_equal(back, f)


def test_now_ns_monotonic():
    a = frameio.now_ns()
    b = frameio.now_ns()
    assert b >= a > 0
