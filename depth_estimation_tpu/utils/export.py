"""Serialized StableHLO export of the frame programs (deployment artifact).

The reference deploys by shipping Python + torch.hub downloads
(depth_midas.py:10). The TPU-native deployment story is an ahead-of-time
artifact: ``jax.export`` serializes the whole fused frame program (uint8
BGR→RGB, /255, cubic resize, normalize, forward, bicubic upsample) as
versioned StableHLO bytes that a serving process reloads WITHOUT this
package's model code — only jax and the weights. Weights stay an argument
(not baked into the artifact), so one artifact serves any checkpoint of
the same architecture.

Usage:
    blob = export_frame_program(est, (480, 640))
    pathlib.Path("dpt_480x640.shlo").write_bytes(blob)
    # serving side:
    fn = load_frame_program(blob_or_path)
    depth = fn(params, bgr_u8_frame)

CLI: ``python tools/export_program.py --model-type DPT_Large --hw 480 640
--out dpt.shlo``.
"""

from __future__ import annotations

import pathlib
from typing import Optional, Sequence, Tuple

import jax


def export_frame_program(
    estimator,
    in_hw: Tuple[int, int],
    platforms: Optional[Sequence[str]] = None,
    batched: bool = False,
    batch: int = 1,
) -> bytes:
    """Serialize the estimator's jitted frame program for ``in_hw``.

    ``platforms``: lowering targets, e.g. ('tpu', 'cpu') for an artifact
    that runs on both (default: the current backend). ``batched=True``
    exports the (B, H, W, 3) batched program instead of the single-frame
    one.
    """
    import numpy as np

    if batched:
        fn = estimator._batched_fn(in_hw)
        img_spec = jax.ShapeDtypeStruct((batch, *in_hw, 3), np.uint8)
    else:
        fn = estimator.frame_fn(in_hw)
        img_spec = jax.ShapeDtypeStruct((*in_hw, 3), np.uint8)
    params_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), estimator.params
    )
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax.export.export(fn, **kw)(params_spec, img_spec)
    return bytes(exported.serialize())  # serialize() returns a bytearray


def export_fused_program(
    estimator,
    detector,
    in_hw: Tuple[int, int],
    include_pose: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the config-4 FUSED frame program (runtime/fused.py::
    make_fused_iris_frame_fn): depth + BlazeFace + FaceMesh/iris
    (+ BlazePose miss branch) + device postprocess + depth sampling as ONE
    deployment artifact. The loaded callable takes (depth_params,
    face_params, mesh_params[, pose_params], img_u8 (H,W,3),
    fallback_pts (2,2) i32) and returns the fused output dict."""
    import numpy as np

    from depth_estimation_tpu.runtime.fused import make_fused_iris_frame_fn

    fn = make_fused_iris_frame_fn(
        estimator, detector, in_hw, include_pose=include_pose,
        emit_depth_map=False,
    )
    spec = lambda tree: jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)
    args = [spec(estimator.params), spec(detector._face_det_params),
            spec(detector._mesh_params)]
    if include_pose:
        args.append(spec(detector._pose_params))
    args.append(jax.ShapeDtypeStruct((*in_hw, 3), np.uint8))
    args.append(jax.ShapeDtypeStruct((2, 2), np.int32))
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax.export.export(fn, **kw)(*args)
    return bytes(exported.serialize())


def load_frame_program(blob_or_path):
    """bytes or path of a serialized program → callable(params, img_u8)."""
    if isinstance(blob_or_path, (str, pathlib.Path)):
        blob = pathlib.Path(blob_or_path).read_bytes()
    else:
        blob = bytes(blob_or_path)
    exported = jax.export.deserialize(blob)
    return exported.call
