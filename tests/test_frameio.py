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


def test_compressed_png_roundtrip_and_shrinks(tmp_path):
    """Levels 1-9 (zlib builds): bit-exact pixels, much smaller files on
    gradient-like content (the Sub filter turns horizontal gradients into
    near-zero runs). Skips the size check on zlib-less builds."""
    from PIL import Image

    # horizontal gradient + a block: representative of sky/sea frames
    x = np.linspace(0, 255, 96, dtype=np.uint8)
    img = np.stack([np.tile(x, (48, 1))] * 3, axis=-1)
    img[20:30, 40:60] = (200, 30, 30)
    p0, p6 = str(tmp_path / "l0.png"), str(tmp_path / "l6.png")
    try:
        assert frameio.set_png_level(0) == 0
        frameio.write_png(img, p0)
        effective = frameio.set_png_level(6)
        frameio.write_png(img, p6)
    finally:
        frameio.set_png_level(0)       # global: restore for other tests
    for p in (p0, p6):
        back = np.asarray(Image.open(p).convert("RGB"))
        assert np.array_equal(back, img), p
    if effective == 6:                 # zlib build (this CI image has it)
        assert os.path.getsize(p6) < os.path.getsize(p0) / 3


def test_async_writer_multiworker_compressed(tmp_path):
    """Several workers + compression: every frame lands bit-exact (the
    ring pop is the only shared state; frames are independent)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
              for _ in range(12)]
    try:
        frameio.set_png_level(1)
        with frameio.AsyncFrameWriter(ring=3, threads=4) as w:
            for i, f in enumerate(frames):
                w.submit(f, str(tmp_path / f"{i}.png"))
            w.drain()
            assert w.written == 12 and w.failed == 0
    finally:
        frameio.set_png_level(0)
    for i, f in enumerate(frames):
        back = np.asarray(
            Image.open(str(tmp_path / f"{i}.png")).convert("RGB"))
        assert np.array_equal(back, f), i


def test_set_png_level_old_so_reports_zero(monkeypatch):
    """A loaded .so that predates fio_set_png_level encodes at its built-in
    level 0 — set_png_level must report 0 (not echo the request) so the
    CLI's clamp note fires and the writer stays single-threaded."""
    from raytracing_cuda_tpu.utils import frameio

    class OldLib:           # no fio_set_png_level attribute at all
        pass

    monkeypatch.setattr(frameio, "_load", lambda: OldLib())
    assert frameio.set_png_level(6) == 0
    assert frameio.set_png_level(0) == 0
