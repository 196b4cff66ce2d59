"""Test harness config: run the whole suite on a virtual 8-device CPU mesh.

The CI/test path never requires a real TPU: JAX is forced onto the CPU
backend with 8 virtual devices so sharding/pjit tests exercise real
multi-device code paths (SURVEY.md §4).

Note: this environment force-registers a tunneled TPU backend in
``sitecustomize`` (PYTHONPATH=/root/.axon_site) and sets JAX_PLATFORMS=axon,
so plain env vars are NOT enough — we must override the jax config after
import, before any backend is initialized. TPU-only tests (Pallas compiled
path, benchmarks) opt back in via scripts outside pytest.
"""

import os

# must be set before the first backend initialization
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
