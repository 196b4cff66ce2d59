"""Structural TFLite→Flax converter tests.

Two levels:

* Each real detector model (BlazeFace, FaceMesh, IrisLandmark,
  BlazePoseDetector, BlazePose): generate a synthetic TFLite op stream FROM
  the model's own param template (weights re-laid-out into TFLite layouts,
  in execution order, with unrelated ops interleaved) and run the
  structural matcher. Exact round-trip equality proves that the converter
  and the architecture agree on every layer's order, kind and shape — the
  property that makes dropping in a REAL .tflite file a pure
  shape-verification exercise.
* A miniature .tflite flatbuffer with real operator tables is built
  in-memory, read back with read_tflite_ops, and converted into a tiny
  Flax model's params (the full file-level path).
"""

import flax.linen as nn
import numpy as np
import pytest

flatbuffers = pytest.importorskip("flatbuffers")

from depth_estimation_tpu.utils.convert import assign_tflite_weights, flax_layer_order
from depth_estimation_tpu.utils.tflite_synth import (
    fill_random as _fill_random,
    ordered_slots,
    to_tflite_stream,
)


def _ordered_slots(model, shape, filled):
    return ordered_slots(model, shape, filled)


def _to_tflite_stream(slots, rng, interleave_noise=True):
    return to_tflite_stream(slots, interleave_noise=interleave_noise, rng=rng)


def _assert_trees_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a)} != {set(b)}"
        for k in a:
            _assert_trees_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(a, b, err_msg=path)


MODELS = []


def _models():
    global MODELS
    if MODELS:
        return MODELS
    from depth_estimation_tpu.models.blazeface import BlazeFace
    from depth_estimation_tpu.models.blazepose import BlazePose, BlazePoseDetector
    from depth_estimation_tpu.models.facemesh import FaceMesh, IrisLandmark

    MODELS = [
        ("BlazeFace", BlazeFace(), (1, 128, 128, 3)),
        ("FaceMesh", FaceMesh(), (1, 192, 192, 3)),
        ("IrisLandmark", IrisLandmark(), (1, 64, 64, 3)),
        ("BlazePoseDetector", BlazePoseDetector(), (1, 224, 224, 3)),
        ("BlazePose", BlazePose(), (1, 256, 256, 3)),
    ]
    return MODELS


@pytest.mark.parametrize("idx", range(5))
def test_structural_roundtrip(idx, rng):
    name, model, shape = _models()[idx]
    _order, tpl = flax_layer_order(model, shape)
    filled = _fill_random(tpl, rng)
    ops, consts = _to_tflite_stream(_ordered_slots(model, shape, filled), rng)
    out = assign_tflite_weights(ops, consts, model, shape, name)
    _assert_trees_equal(out, filled, name)


def test_execution_order_differs_from_dict_order():
    """The property that forced interceptor-based ordering: flax sorts param
    dict keys, which does NOT match graph execution order for our models."""
    from depth_estimation_tpu.models.facemesh import FaceMesh

    order, tpl = flax_layer_order(FaceMesh(), (1, 192, 192, 3))
    assert order[0] == ("stem",)
    assert order[1] == ("stem_act",)
    sorted_paths = sorted(order)
    assert order != sorted_paths


def test_mismatched_stream_raises(rng):
    """A stream whose first conv has the wrong channel count must fail with
    a diagnostic naming the layer, not silently misassign."""
    from depth_estimation_tpu.models.facemesh import IrisLandmark

    model, shape = IrisLandmark(), (1, 64, 64, 3)
    _order, tpl = flax_layer_order(model, shape)
    filled = _fill_random(tpl, rng)
    ops, consts = _to_tflite_stream(_ordered_slots(model, shape, filled), rng)
    # corrupt the first conv kernel's shape
    first_conv = next(i for i, op in enumerate(ops) if op.op == "CONV_2D")
    kidx = ops[first_conv].inputs[1]
    consts[kidx] = consts[kidx][:, :, :, :-1]
    with pytest.raises(ValueError, match="no TFLite weight matches"):
        assign_tflite_weights(ops, consts, model, shape, "IrisLandmark")


# -- file-level path: miniature flatbuffer with operator tables ---------------

class _TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        from depth_estimation_tpu.models.layers import PReLU

        h = nn.Conv(8, (3, 3), padding="SAME", name="c1")(x)
        h = PReLU(8, name="p1")(h)
        h = nn.Conv(8, (3, 3), padding="SAME", feature_group_count=8, name="dw")(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(4, name="d1")(h)


def _build_tflite_with_ops(layers):
    """Serialize a minimal TFLite Model with buffers, tensors, opcodes and an
    operator stream. layers: [(op_name, [const arrays])]."""
    OPCODES = {"CONV_2D": 3, "DEPTHWISE_CONV_2D": 4, "FULLY_CONNECTED": 9, "PRELU": 54}
    b = flatbuffers.Builder(4096)

    buffer_offsets = []
    b.StartObject(1)
    buffer_offsets.append(b.EndObject())  # empty buffer 0

    tensor_meta = []  # (shape, dtype_code, buffer_idx)
    op_specs = []  # (opcode_list_idx, [tensor indices])
    opcode_order = []

    flat_consts = []
    for op_name, consts in layers:
        if op_name not in opcode_order:
            opcode_order.append(op_name)
        idxs = [len(tensor_meta)]  # input activation tensor (buffer 0)
        tensor_meta.append(((1, 8), 0, 0))
        for arr in consts:
            data_vec_idx = len(buffer_offsets)
            raw = arr.astype(np.float32).tobytes()
            dv = b.CreateByteVector(raw)
            b.StartObject(1)
            b.PrependUOffsetTRelativeSlot(0, dv, 0)
            buffer_offsets.append(b.EndObject())
            idxs.append(len(tensor_meta))
            tensor_meta.append((arr.shape, 0, data_vec_idx))
            flat_consts.append(arr)
        out_idx = len(tensor_meta)
        tensor_meta.append(((1, 8), 0, 0))
        op_specs.append((opcode_order.index(op_name), idxs, [out_idx]))

    tensor_offsets = []
    for shape, dtype_code, buf in tensor_meta:
        b.StartVector(4, len(shape), 4)
        for d in reversed(shape):
            b.PrependInt32(int(d))
        shape_vec = b.EndVector()
        b.StartObject(4)
        b.PrependUOffsetTRelativeSlot(0, shape_vec, 0)
        b.PrependInt8Slot(1, dtype_code, 0)
        b.PrependUint32Slot(2, buf, 0)
        tensor_offsets.append(b.EndObject())

    op_offsets = []
    for opcode_idx, ins, outs in op_specs:
        b.StartVector(4, len(ins), 4)
        for i in reversed(ins):
            b.PrependInt32(i)
        in_vec = b.EndVector()
        b.StartVector(4, len(outs), 4)
        for i in reversed(outs):
            b.PrependInt32(i)
        out_vec = b.EndVector()
        b.StartObject(3)
        b.PrependUint32Slot(0, opcode_idx, 0)
        b.PrependUOffsetTRelativeSlot(1, in_vec, 0)
        b.PrependUOffsetTRelativeSlot(2, out_vec, 0)
        op_offsets.append(b.EndObject())

    def _vec_of_tables(offsets):
        b.StartVector(4, len(offsets), 4)
        for off in reversed(offsets):
            b.PrependUOffsetTRelative(off)
        return b.EndVector()

    tensors_vec = _vec_of_tables(tensor_offsets)
    ops_vec = _vec_of_tables(op_offsets)

    b.StartObject(5)
    b.PrependUOffsetTRelativeSlot(0, tensors_vec, 0)
    b.PrependUOffsetTRelativeSlot(3, ops_vec, 0)
    subgraph = b.EndObject()
    subgraphs_vec = _vec_of_tables([subgraph])

    oc_offsets = []
    for name in opcode_order:
        b.StartObject(4)
        b.PrependInt32Slot(3, OPCODES[name], 0)  # builtin_code (new field)
        oc_offsets.append(b.EndObject())
    opcodes_vec = _vec_of_tables(oc_offsets)
    buffers_vec = _vec_of_tables(buffer_offsets)

    b.StartObject(5)
    b.PrependUint32Slot(0, 3, 0)
    b.PrependUOffsetTRelativeSlot(1, opcodes_vec, 0)
    b.PrependUOffsetTRelativeSlot(2, subgraphs_vec, 0)
    b.PrependUOffsetTRelativeSlot(4, buffers_vec, 0)
    b.Finish(b.EndObject())
    return bytes(b.Output())


def test_miniature_tflite_file_to_params(tmp_path, rng):
    import jax

    from depth_estimation_tpu.utils.tflite import read_tflite_ops

    net = _TinyNet()
    _order, tpl = flax_layer_order(net, (1, 8, 8, 3))
    filled = _fill_random(tpl, rng)

    layers = [
        ("CONV_2D", [filled["c1"]["kernel"].transpose(3, 0, 1, 2), filled["c1"]["bias"]]),
        ("PRELU", [filled["p1"]["alpha"].reshape(1, 1, -1)]),
        ("DEPTHWISE_CONV_2D", [filled["dw"]["kernel"].transpose(2, 0, 1, 3), filled["dw"]["bias"]]),
        ("FULLY_CONNECTED", [filled["d1"]["kernel"].T.copy(), filled["d1"]["bias"]]),
    ]
    blob = _build_tflite_with_ops(layers)
    path = tmp_path / "tiny_net.tflite"
    path.write_bytes(blob)

    ops, consts, _names = read_tflite_ops(str(path))
    assert [o.op for o in ops] == ["CONV_2D", "PRELU", "DEPTHWISE_CONV_2D", "FULLY_CONNECTED"]
    out = assign_tflite_weights(ops, consts, net, (1, 8, 8, 3), "TinyNet")
    _assert_trees_equal(out, filled, "TinyNet")

    # and the params actually run
    y = jax.jit(net.apply)({"params": out}, np.zeros((1, 8, 8, 3), np.float32))
    assert y.shape == (1, 4)


# -- full-size file-level path (tflite_synth serializer) ----------------------


def test_serialized_fullsize_file_roundtrip(tmp_path, rng):
    """serialize_tflite → read_tflite_ops → assign_tflite_weights at a REAL
    model size (IrisLandmark, the smallest of the five): the complete
    file-level conversion path with full-size tensors. The other four run
    via the opt-in drop rehearsal (test_tflite_rehearsal.py)."""
    from depth_estimation_tpu.models.facemesh import IrisLandmark
    from depth_estimation_tpu.utils.tflite import read_tflite_ops
    from depth_estimation_tpu.utils.tflite_synth import synthesize_model_file

    model, shape = IrisLandmark(), (1, 64, 64, 3)
    blob, filled = synthesize_model_file(model, shape, rng)
    path = tmp_path / "iris_landmark.tflite"
    path.write_bytes(blob)

    ops, consts, _names = read_tflite_ops(str(path))
    out = assign_tflite_weights(ops, consts, model, shape, "IrisLandmark")
    _assert_trees_equal(out, filled, "IrisLandmark")


def test_extra_branch_layers_require_allow_skips(rng):
    """Mid-stream branch weights (the pose segmentation stand-in) must fail
    strict matching and succeed with allow_skips (warned)."""
    from depth_estimation_tpu.models.facemesh import IrisLandmark
    from depth_estimation_tpu.utils.tflite_synth import (
        fill_random,
        ordered_slots,
        to_tflite_stream,
    )

    model, shape = IrisLandmark(), (1, 64, 64, 3)
    _order, tpl = flax_layer_order(model, shape)
    filled = fill_random(tpl, rng)
    ops, consts = to_tflite_stream(
        ordered_slots(model, shape, filled), extra_branch_layers=2, rng=rng
    )
    with pytest.raises(ValueError, match="no TFLite weight matches"):
        assign_tflite_weights(ops, consts, model, shape, "IrisLandmark")
    with pytest.warns(UserWarning, match="skipped 2 weight op"):
        out = assign_tflite_weights(
            ops, consts, model, shape, "IrisLandmark", allow_skips=True
        )
    _assert_trees_equal(out, filled, "IrisLandmark")
