"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding paths are exercised on a virtual CPU mesh (the strategy
SURVEY.md section 4 prescribes); benchmarks run separately on real TPU
hardware via bench.py. Must set flags before jax initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize may have pre-registered a TPU plugin and
# pinned jax_platforms before we run; config.update overrides it in-process.
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache + bounded live-executable set: the XLA CPU
# compiler segfaults deterministically deep into a single-process run of
# the full suite (reproduced twice at the same point, LLVM frame inside
# backend_compile_and_load; test modules pass in isolation). Clearing
# jax's executable caches between modules keeps the compiler state
# bounded, and the disk cache makes the resulting recompiles cheap.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    yield
    jax.clear_caches()

REFERENCE_ROOT = "/root/reference"
SCENES_ROOT = os.path.join(REFERENCE_ROOT, "Scenes")


def require_scene(name: str) -> str:
    path = os.path.join(SCENES_ROOT, name)
    if not os.path.exists(path):
        pytest.skip(f"reference scene not available: {path}")
    return path


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
