"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

The test suite never requires TPU hardware; multi-device sharding tests run on
the XLA host platform with 8 virtual devices (SURVEY.md §4 implication (c)).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/jax_comp_cache_tests"))

import jax

# The environment's sitecustomize registers a TPU platform plugin and rewrites
# jax_platforms; force CPU again before any backend initialises.
jax.config.update("jax_platforms", "cpu")
# XLA:CPU compiles dominate the suite's wall clock on this 1-core box
# (~19 min cold); the persistent cache brings repeat runs down ~4x.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
