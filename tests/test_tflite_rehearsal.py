"""Opt-in full-size .tflite drop rehearsal (VERDICT r2 #2).

Pushes ALL FIVE detector models through the complete drop-day path at real
sizes: synthesized real-shape flatbuffers → ``import_weights --tflite`` →
orbax cache → PersonDetector/FaceDetector auto-load → fused-program output
identity. ~2-5 min on one CPU core, so opt-in:

    DEPTH_TPU_REHEARSAL=1 python -m pytest tests/test_tflite_rehearsal.py -q

(or run ``python tools/tflite_rehearsal.py`` directly). The CI-speed slice
of the same path (smallest model, file-level) runs unconditionally in
test_tflite_convert.py::test_serialized_fullsize_file_roundtrip.
"""

import os
import pathlib
import sys

import pytest

pytest.importorskip("flatbuffers")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.skipif(
    not os.environ.get("DEPTH_TPU_REHEARSAL"),
    reason="full-size five-model rehearsal is opt-in (DEPTH_TPU_REHEARSAL=1)",
)
def test_full_drop_rehearsal(tmp_path, monkeypatch):
    import tflite_rehearsal

    monkeypatch.setenv("DEPTH_ESTIMATION_TPU_CACHE", str(tmp_path))
    report = tflite_rehearsal.rehearse(tmp_path, seed=0, log=lambda *a: None)
    assert report["ok"]
    assert len(report["files"]) == 5
