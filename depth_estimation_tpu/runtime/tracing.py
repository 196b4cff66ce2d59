"""Profiling / tracing hooks (SURVEY.md §5 aux subsystems).

The reference's only instrumentation is process_time brackets
(midas_mediapipe.py:52-60); kept in runtime/timing.py. This module adds the
TPU-native layer: ``jax.profiler`` trace capture (xplane dumps readable in
TensorBoard/XProf) and annotated trace spans around pipeline stages.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a device trace for the enclosed block.

    Writes an xplane dump under ``log_dir`` (default
    $DEPTH_TPU_TRACE_DIR or ./jax_trace). View with xprof/TensorBoard.
    """
    import jax

    log_dir = log_dir or os.environ.get("DEPTH_TPU_TRACE_DIR", "./jax_trace")
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def span(name: str):
    """Named span that shows up on the trace timeline — wrap pipeline stages
    (decode / preprocess / infer / encode) to see overlap."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(enabled: bool, log_dir: Optional[str] = None):
    if enabled:
        with trace(log_dir) as d:
            yield d
    else:
        yield None
