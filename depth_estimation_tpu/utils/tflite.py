"""Minimal TFLite flatbuffer reader: weight tensors + operator stream.

Groundwork for importing the real MediaPipe detector weights (BlazeFace /
FaceMesh / BlazePose ship as .tflite files; SURVEY.md §7 hard-part (d)).
No tensorflow/tflite bindings exist in this environment, so this walks the
flatbuffer manually with the stable TFLite schema field ids:

  Model:        version=0, operator_codes=1, subgraphs=2, description=3, buffers=4
  OperatorCode: deprecated_builtin_code=0, custom_code=1, version=2, builtin_code=3
  SubGraph:     tensors=0, inputs=1, outputs=2, operators=3, name=4
  Operator:     opcode_index=0, inputs=1, outputs=2
  Tensor:       shape=0, type=1, buffer=2, name=3
  Buffer:       data=0

(field id k lives at vtable offset 4 + 2k). ``read_tflite_tensors`` returns
only constant tensors (those whose buffer has data) — i.e. the weights.
``read_tflite_ops`` additionally returns the operator stream in execution
order, which is what the structural weight converters key on
(utils/convert.py): graph order + kernel shapes identify each layer without
relying on tensor names.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

try:
    import flatbuffers
    from flatbuffers import number_types as NT

    HAVE_FLATBUFFERS = True
except ImportError:  # pragma: no cover
    HAVE_FLATBUFFERS = False

_DTYPES = {
    0: np.float32,
    1: np.float16,
    2: np.int32,
    3: np.uint8,
    4: np.int64,
    6: np.bool_,
    7: np.int16,
    9: np.int8,
    10: np.float64,
}


def _field(table, fid):
    """vtable offset of field id ``fid`` (0 if absent)."""
    return table.Offset(4 + 2 * fid)


def _table_vector_elem(table, fid, i):
    """i-th table element of a [table] vector field."""
    o = _field(table, fid)
    if not o:
        return None
    vec = table.Vector(o)
    elem = table.Indirect(vec + 4 * i)
    import flatbuffers.table as fbt

    return fbt.Table(table.Bytes, elem)


def _vector_len(table, fid):
    o = _field(table, fid)
    return table.VectorLen(o) if o else 0


def _string(table, fid):
    # flatbuffers' Table.String takes an ABSOLUTE offset (unlike
    # Vector/VectorLen which add Pos internally)
    o = _field(table, fid)
    return table.String(o + table.Pos).decode() if o else ""


def _int_vector(table, fid):
    o = _field(table, fid)
    if not o:
        return []
    n = table.VectorLen(o)
    vec = table.Vector(o)
    return [table.Get(NT.Int32Flags, vec + 4 * i) for i in range(n)]


def _ubyte_vector_bytes(table, fid):
    o = _field(table, fid)
    if not o:
        return b""
    n = table.VectorLen(o)
    start = table.Vector(o)
    return bytes(table.Bytes[start : start + n])


# TFLite BuiltinOperator codes (stable schema enum values)
BUILTIN_OPS = {
    0: "ADD",
    2: "CONCATENATION",
    3: "CONV_2D",
    4: "DEPTHWISE_CONV_2D",
    9: "FULLY_CONNECTED",
    14: "LOGISTIC",
    17: "MAX_POOL_2D",
    22: "RESHAPE",
    23: "RESIZE_BILINEAR",
    34: "PAD",
    54: "PRELU",
    67: "TRANSPOSE_CONV",
    97: "RESIZE_NEAREST_NEIGHBOR",
}


class TFLiteOp:
    """One operator: builtin-op name + input/output tensor indices."""

    __slots__ = ("op", "inputs", "outputs")

    def __init__(self, op: str, inputs, outputs):
        self.op = op
        self.inputs = list(inputs)
        self.outputs = list(outputs)

    def __repr__(self):  # pragma: no cover
        return f"TFLiteOp({self.op}, in={self.inputs}, out={self.outputs})"


def _parse_model(data: bytes):
    import flatbuffers.table as fbt

    root = flatbuffers.encode.Get(flatbuffers.packer.uoffset, data, 0)
    model = fbt.Table(bytearray(data), root)

    n_buffers = _vector_len(model, 4)
    buffers = []
    for i in range(n_buffers):
        b = _table_vector_elem(model, 4, i)
        buffers.append(_ubyte_vector_bytes(b, 0) if b is not None else b"")

    # operator codes: prefer builtin_code (field 3, int32), fall back to the
    # deprecated int8 field 0 (older converters)
    opcodes = []
    for i in range(_vector_len(model, 1)):
        oc = _table_vector_elem(model, 1, i)
        code = 0
        if oc is not None:
            off = _field(oc, 3)
            if off:
                code = oc.Get(NT.Int32Flags, oc.Pos + off)
            else:
                off0 = _field(oc, 0)
                code = oc.Get(NT.Int8Flags, oc.Pos + off0) if off0 else 0
        opcodes.append(BUILTIN_OPS.get(int(code), f"OP_{int(code)}"))

    return model, buffers, opcodes


def _parse_tensor(t, buffers):
    """→ (name, shape, dtype, const_array_or_None)."""
    buf_idx_off = _field(t, 2)
    buf_idx = t.Get(NT.Uint32Flags, t.Pos + buf_idx_off) if buf_idx_off else 0
    raw = buffers[buf_idx] if buf_idx < len(buffers) else b""
    shape = _int_vector(t, 0)
    type_off = _field(t, 1)
    ttype = t.Get(NT.Int8Flags, t.Pos + type_off) if type_off else 0
    dtype = _DTYPES.get(int(ttype))
    name = _string(t, 3)
    arr = None
    if raw and dtype is not None:
        arr = np.frombuffer(raw, dtype=dtype)
        if shape:
            arr = arr.reshape(shape)
    return name, shape, dtype, arr


def read_tflite_ops(path: str):
    """→ (ops: list[TFLiteOp] in execution order, consts: {tensor_idx: array},
    names: {tensor_idx: name}) for subgraph 0."""
    if not HAVE_FLATBUFFERS:
        raise RuntimeError("flatbuffers runtime not available")
    data = open(path, "rb").read()
    model, buffers, opcodes = _parse_model(data)

    sg = _table_vector_elem(model, 2, 0)
    consts: Dict[int, np.ndarray] = {}
    names: Dict[int, str] = {}
    for ti in range(_vector_len(sg, 0)):
        t = _table_vector_elem(sg, 0, ti)
        name, _shape, _dtype, arr = _parse_tensor(t, buffers)
        names[ti] = name
        if arr is not None:
            consts[ti] = arr

    ops = []
    for oi in range(_vector_len(sg, 3)):
        o = _table_vector_elem(sg, 3, oi)
        idx_off = _field(o, 0)
        opcode_idx = o.Get(NT.Uint32Flags, o.Pos + idx_off) if idx_off else 0
        ops.append(
            TFLiteOp(
                opcodes[opcode_idx] if opcode_idx < len(opcodes) else "OP_?",
                _int_vector(o, 1),
                _int_vector(o, 2),
            )
        )
    return ops, consts, names


def read_tflite_tensors(path: str) -> Dict[str, np.ndarray]:
    """{tensor_name: weights} for every constant tensor in the model."""
    if not HAVE_FLATBUFFERS:
        raise RuntimeError("flatbuffers runtime not available")
    data = open(path, "rb").read()
    model, buffers, _opcodes = _parse_model(data)

    out: Dict[str, np.ndarray] = {}
    for si in range(_vector_len(model, 2)):
        sg = _table_vector_elem(model, 2, si)
        for ti in range(_vector_len(sg, 0)):
            t = _table_vector_elem(sg, 0, ti)
            name, _shape, _dtype, arr = _parse_tensor(t, buffers)
            if arr is None:
                continue  # activation tensor / unsupported dtype
            out[name or f"tensor_{si}_{ti}"] = arr
    return out
