"""Platform selection helper.

This environment's sitecustomize force-registers a TPU backend regardless of
``JAX_PLATFORMS`` (see tests/conftest.py). Entry points call
``apply_platform_env()`` early so ``DEPTH_TPU_PLATFORM=cpu`` reliably forces
the CPU backend for development/CI runs.
"""

from __future__ import annotations

import os


def apply_platform_env(var: str = "DEPTH_TPU_PLATFORM") -> None:
    plat = os.environ.get(var)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
