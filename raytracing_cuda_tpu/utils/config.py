"""Engine configuration.

The reference hard-codes every knob as a file-static global (resolution
main.cpp:40-47, camera speeds scene.cpp:14-20, day/night rates
scene.cpp:29-32). Here they live in one dataclass so headless drivers,
benchmarks, and tests can configure runs declaratively.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 1280           # default framebuffer (main.cpp:42-43)
    height: int = 720
    chunk: int = 32768          # pixels per render batch (memory/pipelining knob)
    antialiasing: bool = True   # FXAA default on (scene.cpp:24)
    sky_source: str = "auto"    # 'reference' | 'procedural' | 'auto'
    sky_downsample: int = 1     # point-sample every k-th sky texel
    procedural_sky_shape: tuple = (2048, 4096)
    aspect: float | None = None  # None → width/height.
    # NOTE: the reference initializes camera corners with aspect = 1.7777
    # (scene.cpp:20) and only refreshes them on mouse motion, so a run with an
    # untouched camera renders with 1.7777 regardless of resolution. Set
    # aspect=1.7777 to reproduce that quirk for CUDA-frame comparisons.

    @property
    def resolved_aspect(self) -> float:
        return self.aspect if self.aspect is not None else self.width / self.height
