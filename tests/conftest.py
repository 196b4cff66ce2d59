"""Test harness config: run the whole suite on a virtual 8-device CPU mesh.

The CI/test path never requires a real TPU: JAX is forced onto the CPU
backend with 8 virtual devices so sharding/pjit tests exercise real
multi-device code paths (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
