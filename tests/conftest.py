"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench.py; tests exercise identical jitted
programs on CPU (with x64 enabled by the package import) and validate
multi-device sharding on the virtual mesh (SURVEY.md §4.5).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu",
# overriding the env var — override it back before any backend initializes.
jax.config.update("jax_platforms", "cpu")

# NOTE on full-suite runs: jaxlib 0.9's CPU backend segfaults
# INTERMITTENTLY in long many-compile processes (observed in both
# `put_executable_and_time` serialization and `backend_compile_and_load`
# itself, each after ~55 tests of one `pytest tests/` process; single-file
# runs are stable). This is an upstream flakiness, not a test bug — run the
# suite through scripts/run_tests.py, which batches test files into separate
# processes (bounding the per-process compile count) and retries a crashed
# batch once; the persistent compile cache makes retries cheap.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(648)  # reference Config::random() == 648
