"""Framebuffer image I/O (replaces the CUDA-GL interop display path).

The reference publishes frames through a GL pixel buffer object
(main.cpp:141-165); headless TPU runs read the framebuffer back to host and
write PNGs / feed a window instead.
"""

from __future__ import annotations

import numpy as np


def to_host(image) -> np.ndarray:
    """Device framebuffer → host uint8 (H, W, 3)."""
    return np.asarray(image)


def save_png(image, path: str) -> None:
    from PIL import Image

    Image.fromarray(to_host(image), mode="RGB").save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def box_downsample(image, n: int) -> np.ndarray:
    """Average n×n pixel boxes — the SSAA resolve (beyond-reference:
    `render/record --ssaa N` renders at N× and resolves here).

    (H·n, W·n, C) uint8 → (H, W, C) uint8, rounded half-up (mean+0.5
    truncate — a uint8 mean is ≤255 so the cast can't overflow). HOST
    twin of the on-device preview resolve (app.loop._box_downsample,
    jnp, traced inside the preview jit); the two are pinned equal by
    tests/test_window_smoke.py::test_host_and_device_downsample_agree."""
    img = np.asarray(image)
    if n == 1:
        return img
    h, w = img.shape[0] // n, img.shape[1] // n
    acc = img.astype(np.float32).reshape(h, n, w, n, -1).mean(axis=(1, 3))
    return (acc + 0.5).astype(np.uint8)


def rmse(a, b) -> float:
    """Per-pixel RMSE on the 0..1 scale (the BASELINE.json parity metric)."""
    a = np.asarray(a, np.float64) / 255.0
    b = np.asarray(b, np.float64) / 255.0
    return float(np.sqrt(np.mean((a - b) ** 2)))
