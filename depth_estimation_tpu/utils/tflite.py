"""Minimal TFLite flatbuffer reader: extract named weight tensors.

Groundwork for importing the real MediaPipe detector weights (BlazeFace /
FaceMesh / BlazePose ship as .tflite files; SURVEY.md §7 hard-part (d)).
No tensorflow/tflite bindings exist in this environment, so this walks the
flatbuffer manually with the stable TFLite schema field ids:

  Model:    version=0, operator_codes=1, subgraphs=2, description=3, buffers=4
  SubGraph: tensors=0, inputs=1, outputs=2, operators=3, name=4
  Tensor:   shape=0, type=1, buffer=2, name=3
  Buffer:   data=0

(field id k lives at vtable offset 4 + 2k). Only constant tensors (those
whose buffer has data) are returned — i.e. the weights.
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


def read_tflite_tensors(path: str) -> Dict[str, np.ndarray]:
    """{tensor_name: weights} for every constant tensor in the model."""
    if not HAVE_FLATBUFFERS:
        raise RuntimeError("flatbuffers runtime not available")
    import flatbuffers.table as fbt

    data = open(path, "rb").read()
    root = flatbuffers.encode.Get(flatbuffers.packer.uoffset, data, 0)
    model = fbt.Table(bytearray(data), root)

    n_buffers = _vector_len(model, 4)
    buffers = []
    for i in range(n_buffers):
        b = _table_vector_elem(model, 4, i)
        buffers.append(_ubyte_vector_bytes(b, 0) if b is not None else b"")

    out: Dict[str, np.ndarray] = {}
    n_subgraphs = _vector_len(model, 2)
    for si in range(n_subgraphs):
        sg = _table_vector_elem(model, 2, si)
        n_tensors = _vector_len(sg, 0)
        for ti in range(n_tensors):
            t = _table_vector_elem(sg, 0, ti)
            buf_idx_off = _field(t, 2)
            buf_idx = t.Get(NT.Uint32Flags, t.Pos + buf_idx_off) if buf_idx_off else 0
            raw = buffers[buf_idx] if buf_idx < len(buffers) else b""
            if not raw:
                continue  # activation tensor, no constant data
            shape = _int_vector(t, 0)
            type_off = _field(t, 1)
            ttype = t.Get(NT.Int8Flags, t.Pos + type_off) if type_off else 0
            dtype = _DTYPES.get(int(ttype))
            if dtype is None:
                continue
            arr = np.frombuffer(raw, dtype=dtype)
            if shape:
                arr = arr.reshape(shape)
            name = _string(t, 3)
            out[name or f"tensor_{si}_{ti}"] = arr
    return out
