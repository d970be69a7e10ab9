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


def rmse(a, b) -> float:
    """Per-pixel RMSE on the 0..1 scale (the BASELINE.json parity metric)."""
    a = np.asarray(a, np.float64) / 255.0
    b = np.asarray(b, np.float64) / 255.0
    return float(np.sqrt(np.mean((a - b) ** 2)))
