"""Test harness setup: force the CPU backend with 8 virtual devices.

Must run before jax initializes — tests exercise multi-chip sharding on a
virtual CPU mesh (SURVEY.md §4) and golden-frame parity on the CPU backend.
"""

import os

# NOTE: this environment's sitecustomize imports jax at interpreter startup
# (registering the remote-TPU 'axon' backend), so JAX_PLATFORMS is already
# consumed. XLA_FLAGS is still honored (read at first backend init), and
# jax.config.update can override the platform after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Force CPU AND deregister the remote-TPU backend factory outright
# (sitecustomize has already registered it). jax_platforms="cpu" alone
# does NOT stop backends() from creating the axon client — so when the
# remote tunnel wedges, every Engine construction (its first device_put)
# hangs and the whole CPU-only suite deadlocks. Tests must never depend
# on tunnel health; with the factory gone, jax is pure-CPU no matter
# what. (Shared recipe: utils.config.apply_platform — also used by the
# CLI, bench.py, and the golden generator.)
from raytracing_cuda_tpu.utils.config import apply_platform

apply_platform("cpu")

import numpy as np
import pytest

from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.scene.textures import procedural_skies


@pytest.fixture(scope="session")
def scene():
    return build_scene()

