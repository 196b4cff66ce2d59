"""Synthesize real-shape .tflite flatbuffers from Flax param templates.

Drop-day rehearsal (SURVEY.md §7 hard-part (d)): no MediaPipe .tflite
binary can exist in this container (zero egress), so this module generates
structurally REAL files — full-size weight tensors in TFLite layouts, real
operator/buffer/tensor tables, execution-ordered op streams with
non-weight ops interleaved — from the Flax models' own param templates.
Pushing them through the production import path (``import_weights
--tflite`` → detect/weights.py auto-load → the fused frame programs)
rehearses the exact path a real MediaPipe file drop will take
(reference: requirements.txt:2, mediapipe 0.8.11; detectors.py:48-53's
runtime model loading).

Shared by tests/test_tflite_convert.py (miniature + per-model structural
round-trips) and tools/tflite_rehearsal.py (the full five-file drop).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from depth_estimation_tpu.utils.tflite import BUILTIN_OPS, TFLiteOp

# reverse of utils/tflite.py's dtype table (numpy dtype → TFLite type code)
_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float16): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.uint8): 3,
    np.dtype(np.int64): 4,
    np.dtype(np.int8): 9,
}

_OP_CODES = {name: code for code, name in BUILTIN_OPS.items()}


def fill_random(tree, rng):
    """Zero param template → random f32 tree (deterministic given rng)."""
    if isinstance(tree, dict):
        return {k: fill_random(v, rng) for k, v in tree.items()}
    return rng.standard_normal(tree.shape).astype(np.float32)


def ordered_slots(model, shape, filled):
    """(path, leaf-dict) pairs in TRUE execution order for a filled tree."""
    from depth_estimation_tpu.utils.convert import flax_layer_order

    order, _tpl = flax_layer_order(model, shape)
    slots = []
    for path in order:
        node = filled
        for p in path:
            node = node[p]
        slots.append((path, node))
    return slots


def to_tflite_stream(slots, interleave_noise: bool = True,
                     extra_branch_layers: int = 0, rng=None):
    """Synthesize (ops, consts) in execution order from ordered layer slots,
    re-laid-out into the TFLite conventions the converter undoes:

      conv (H, W, I, O) → (O, H, W, I);  depthwise (H, W, 1, C) → (1, H, W, C)
      dense (in, out) → (out, in);       PReLU alpha (C,) → (1, 1, C)

    ``interleave_noise`` inserts RESHAPE/ADD ops (no weights) the converter
    must step over. ``extra_branch_layers`` injects that many weight-bearing
    convs with shapes matching NO slot into the MIDDLE of the stream — a
    stand-in for graph branches the Flax model deliberately omits (e.g. the
    pose segmentation decoder), exercising ``allow_skips``.
    """
    ops: List[TFLiteOp] = []
    consts: Dict[int, np.ndarray] = {}
    nxt = [0]

    def add_const(arr):
        idx = nxt[0]
        consts[idx] = arr
        nxt[0] += 1
        return idx

    def add_act():
        idx = nxt[0]  # activation tensor: NOT in consts
        nxt[0] += 1
        return idx

    for i, (path, leaf) in enumerate(slots):
        if extra_branch_layers and i == len(slots) // 2:
            r = rng if rng is not None else np.random.default_rng(0)
            for j in range(extra_branch_layers):
                # deliberately slot-incompatible shapes (prime channel counts)
                k = r.standard_normal((13 + j, 3, 3, 7)).astype(np.float32)
                bias = r.standard_normal((13 + j,)).astype(np.float32)
                ops.append(TFLiteOp("CONV_2D", [add_act(), add_const(k), add_const(bias)], [add_act()]))
        if interleave_noise and i % 3 == 0:
            # ops the converter must skip (no weights / reshapes)
            ops.append(TFLiteOp("RESHAPE", [add_act(), add_const(np.array([1, -1], np.int32))], [add_act()]))
            ops.append(TFLiteOp("ADD", [add_act(), add_act()], [add_act()]))
        if "alpha" in leaf:
            a = leaf["alpha"].reshape(1, 1, -1)
            ops.append(TFLiteOp("PRELU", [add_act(), add_const(a)], [add_act()]))
            continue
        k = leaf["kernel"]
        if k.ndim == 2:  # dense: flax (in, out) → tflite (out, in)
            ops.append(
                TFLiteOp("FULLY_CONNECTED", [add_act(), add_const(k.T.copy()), add_const(leaf["bias"])], [add_act()])
            )
        elif k.shape[2] == 1 and k.shape[3] > 1:  # depthwise (H, W, 1, C) → (1, H, W, C)
            ops.append(
                TFLiteOp(
                    "DEPTHWISE_CONV_2D",
                    [add_act(), add_const(k.transpose(2, 0, 1, 3).copy()), add_const(leaf["bias"])],
                    [add_act()],
                )
            )
        else:  # conv (H, W, I, O) → (O, H, W, I)
            ops.append(
                TFLiteOp(
                    "CONV_2D",
                    [add_act(), add_const(k.transpose(3, 0, 1, 2).copy()), add_const(leaf["bias"])],
                    [add_act()],
                )
            )
    return ops, consts


def serialize_tflite(ops, consts) -> bytes:
    """Serialize an (ops, consts) stream into a real TFLite flatbuffer:
    buffers, typed tensors, operator-code table and the operator stream,
    using the stable schema field ids (utils/tflite.py docstring). The
    result round-trips through ``read_tflite_ops``."""
    import flatbuffers

    n_tensors = 0
    for op in ops:
        for t in op.inputs + op.outputs:
            n_tensors = max(n_tensors, t + 1)

    total = sum(int(a.nbytes) for a in consts.values())
    b = flatbuffers.Builder(total + 65536)

    # buffers: index 0 is the canonical empty buffer; one per const tensor
    buffer_offsets = []
    b.StartObject(1)
    buffer_offsets.append(b.EndObject())
    buffer_of_tensor = {}
    for tidx in sorted(consts):
        raw = np.ascontiguousarray(consts[tidx]).tobytes()
        dv = b.CreateByteVector(raw)
        b.StartObject(1)
        b.PrependUOffsetTRelativeSlot(0, dv, 0)
        buffer_of_tensor[tidx] = len(buffer_offsets)
        buffer_offsets.append(b.EndObject())

    tensor_offsets = []
    for tidx in range(n_tensors):
        if tidx in consts:
            arr = consts[tidx]
            shape = arr.shape
            code = _DTYPE_CODES[np.dtype(arr.dtype)]
            buf = buffer_of_tensor[tidx]
        else:  # activation tensor: dynamic, empty buffer
            shape, code, buf = (1, 1), 0, 0
        b.StartVector(4, len(shape), 4)
        for d in reversed(shape):
            b.PrependInt32(int(d))
        shape_vec = b.EndVector()
        b.StartObject(4)
        b.PrependUOffsetTRelativeSlot(0, shape_vec, 0)
        b.PrependInt8Slot(1, code, 0)
        b.PrependUint32Slot(2, buf, 0)
        tensor_offsets.append(b.EndObject())

    opcode_order = []
    for op in ops:
        if op.op not in opcode_order:
            opcode_order.append(op.op)

    op_offsets = []
    for op in ops:
        b.StartVector(4, len(op.inputs), 4)
        for i in reversed(op.inputs):
            b.PrependInt32(int(i))
        in_vec = b.EndVector()
        b.StartVector(4, len(op.outputs), 4)
        for i in reversed(op.outputs):
            b.PrependInt32(int(i))
        out_vec = b.EndVector()
        b.StartObject(3)
        b.PrependUint32Slot(0, opcode_order.index(op.op), 0)
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
        b.PrependInt32Slot(3, _OP_CODES[name], 0)  # builtin_code (new field)
        oc_offsets.append(b.EndObject())
    opcodes_vec = _vec_of_tables(oc_offsets)
    buffers_vec = _vec_of_tables(buffer_offsets)

    b.StartObject(5)
    b.PrependUint32Slot(0, 3, 0)  # schema version
    b.PrependUOffsetTRelativeSlot(1, opcodes_vec, 0)
    b.PrependUOffsetTRelativeSlot(2, subgraphs_vec, 0)
    b.PrependUOffsetTRelativeSlot(4, buffers_vec, 0)
    b.Finish(b.EndObject())
    return bytes(b.Output())


def synthesize_model_file(model, input_shape, rng, extra_branch_layers: int = 0
                          ) -> Tuple[bytes, Dict]:
    """→ (real-shape .tflite bytes, the random param tree the file encodes).
    The returned tree is the conversion oracle: a correct import must
    reproduce it exactly."""
    from depth_estimation_tpu.utils.convert import flax_layer_order

    _order, tpl = flax_layer_order(model, input_shape)
    filled = fill_random(tpl, rng)
    slots = ordered_slots(model, input_shape, filled)
    ops, consts = to_tflite_stream(
        slots, interleave_noise=True, extra_branch_layers=extra_branch_layers, rng=rng
    )
    return serialize_tflite(ops, consts), filled
