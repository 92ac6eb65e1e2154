"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU-native way — ``jax.sharding.Mesh``
over ``--xla_force_host_platform_device_count=8`` CPU devices — so the suite
never needs (or touches) real TPU hardware.  This must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# A sitecustomize hook may force-register an external TPU platform and
# override JAX_PLATFORMS; the config knob takes precedence over both.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles of
# scan-heavy train steps; caching them makes re-runs fast.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
