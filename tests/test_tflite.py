"""TFLite reader test: build a tiny valid TFLite flatbuffer by hand with the
flatbuffers runtime, then read the weights back."""

import numpy as np
import pytest

flatbuffers = pytest.importorskip("flatbuffers")

from depth_estimation_tpu.utils.tflite import read_tflite_tensors


def _build_tflite(tensors):
    """tensors: list of (name, np.ndarray). Returns serialized Model bytes
    following the TFLite schema (version=3, one subgraph)."""
    b = flatbuffers.Builder(1024)

    # Buffers: buffer 0 is conventionally empty; one buffer per tensor after
    buffer_offsets = []
    # empty buffer 0
    b.StartObject(1)
    buffer_offsets.append(b.EndObject())
    for _name, arr in tensors:
        raw = arr.tobytes()
        data_vec = b.CreateByteVector(raw)
        b.StartObject(1)
        b.PrependUOffsetTRelativeSlot(0, data_vec, 0)
        buffer_offsets.append(b.EndObject())

    _DT = {np.dtype(np.float32): 0, np.dtype(np.int32): 2, np.dtype(np.uint8): 3}

    tensor_offsets = []
    for i, (name, arr) in enumerate(tensors):
        name_off = b.CreateString(name)
        b.StartVector(4, len(arr.shape), 4)
        for d in reversed(arr.shape):
            b.PrependInt32(d)
        shape_vec = b.EndVector()
        b.StartObject(4)
        b.PrependUOffsetTRelativeSlot(0, shape_vec, 0)  # shape
        b.PrependInt8Slot(1, _DT[arr.dtype], 0)  # type
        b.PrependUint32Slot(2, i + 1, 0)  # buffer index
        b.PrependUOffsetTRelativeSlot(3, name_off, 0)  # name
        tensor_offsets.append(b.EndObject())

    # one activation tensor bound to empty buffer 0 (must be skipped)
    act_name = b.CreateString("activation")
    b.StartVector(4, 1, 4)
    b.PrependInt32(8)
    act_shape = b.EndVector()
    b.StartObject(4)
    b.PrependUOffsetTRelativeSlot(0, act_shape, 0)
    b.PrependInt8Slot(1, 0, 0)
    b.PrependUint32Slot(2, 0, 0)
    b.PrependUOffsetTRelativeSlot(3, act_name, 0)
    tensor_offsets.append(b.EndObject())

    b.StartVector(4, len(tensor_offsets), 4)
    for off in reversed(tensor_offsets):
        b.PrependUOffsetTRelative(off)
    tensors_vec = b.EndVector()

    b.StartObject(5)
    b.PrependUOffsetTRelativeSlot(0, tensors_vec, 0)  # SubGraph.tensors
    subgraph = b.EndObject()

    b.StartVector(4, 1, 4)
    b.PrependUOffsetTRelative(subgraph)
    subgraphs_vec = b.EndVector()

    b.StartVector(4, len(buffer_offsets), 4)
    for off in reversed(buffer_offsets):
        b.PrependUOffsetTRelative(off)
    buffers_vec = b.EndVector()

    b.StartObject(5)
    b.PrependUint32Slot(0, 3, 0)  # Model.version = 3
    b.PrependUOffsetTRelativeSlot(2, subgraphs_vec, 0)  # subgraphs
    b.PrependUOffsetTRelativeSlot(4, buffers_vec, 0)  # buffers
    model = b.EndObject()
    b.Finish(model)
    return bytes(b.Output())


def test_read_tflite_tensors_roundtrip(tmp_path, rng):
    w1 = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    w2 = rng.integers(0, 255, (16,), dtype=np.uint8)
    w3 = rng.integers(-5, 5, (2, 2)).astype(np.int32)
    blob = _build_tflite([("conv/kernel", w1), ("lut", w2), ("bias", w3)])
    path = tmp_path / "tiny.tflite"
    path.write_bytes(blob)

    out = read_tflite_tensors(str(path))
    assert set(out) == {"conv/kernel", "lut", "bias"}  # activation skipped
    np.testing.assert_array_equal(out["conv/kernel"], w1)
    np.testing.assert_array_equal(out["lut"], w2)
    np.testing.assert_array_equal(out["bias"], w3)
