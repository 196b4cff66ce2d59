"""Debug-mode guards (SURVEY.md §5 "race detection / sanitizers" row).

The reference is single-threaded with nothing to race; the TPU build's
equivalent hazards are shape/dtype drift across the jit boundary and
accidental reuse of donated buffers. ``DEPTH_TPU_DEBUG=1`` enables:

* chex shape/dtype assertions at the frame-function boundaries,
* jax's donation/NaN checking knobs.
"""

from __future__ import annotations

import os


def debug_enabled() -> bool:
    return os.environ.get("DEPTH_TPU_DEBUG", "") not in ("", "0", "false")


def enable_jax_debug_flags() -> None:
    """Turn on jax-level sanitizers (call before building jit programs)."""
    import jax

    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


def check_frame_input(img) -> None:
    """Validate a frame entering the pipeline (only under DEPTH_TPU_DEBUG)."""
    if not debug_enabled():
        return
    import chex
    import numpy as np

    chex.assert_rank(img, 3)
    chex.assert_axis_dimension(img, 2, 3)
    assert img.dtype == np.uint8, f"frames must be uint8 BGR, got {img.dtype}"


def check_depth_output(depth, expected_hw) -> None:
    if not debug_enabled():
        return
    import chex

    chex.assert_rank(depth, 2)
    chex.assert_shape(depth, tuple(expected_hw))
