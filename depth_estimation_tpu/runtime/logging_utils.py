"""Structured logging (SURVEY.md §5 metrics/observability row).

The reference's observability is print statements + on-frame HUD text
(depth_midas.py:63,75; midas_mediapipe.py:118-122). This module adds a
structured channel: JSON-lines records of the same fields (frame counter,
per-stage timings, distances, errors) written to ``DEPTH_TPU_LOG_JSON``
(a path) when set, alongside the reference-format prints.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Optional


class JsonLogger:
    def __init__(self, path: Optional[str] = None):
        path = path or os.environ.get("DEPTH_TPU_LOG_JSON")
        self._fh: Optional[IO] = open(path, "a") if path else None

    @property
    def enabled(self) -> bool:
        return self._fh is not None

    def log(self, event: str, **fields) -> None:
        if self._fh is None:
            return
        rec = {"ts": time.time(), "event": event, **fields}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
