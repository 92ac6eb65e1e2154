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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
