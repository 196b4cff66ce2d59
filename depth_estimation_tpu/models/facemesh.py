"""FaceMesh + iris landmark networks (N4 in SURVEY.md §2b).

TPU-native equivalents of the MediaPipe models behind
``FaceMesh(refine_landmarks=True)`` — the 478-landmark stack whose iris
points (indices 468-477) the reference consumes at detectors.py:19-20.

Three modules:

* ``FaceMesh`` — the public ``face_landmark.tflite`` graph: 192×192 crop →
  468×3 landmarks (crop-pixel units) + face-presence logit. Architecture
  matches the documented public port of the TFLite graph layer-for-layer
  (stem conv + 14 depthwise residual blocks + two conv heads), so the
  structural TFLite converter (utils/convert.py::convert_facemesh_tflite)
  can populate it 1:1 from the real weights.
* ``IrisLandmark`` — the public ``iris_landmark.tflite`` graph: 64×64 eye
  crop → 71×3 eye-contour + 5×3 iris landmarks. Bottleneck depthwise blocks
  per the public port of the TFLite graph.
* ``FaceMeshWithIris`` — the composition MediaPipe's refine_landmarks
  pipeline performs: mesh → eye ROIs from the eye-corner landmarks →
  64×64 crops (right eye mirrored) → iris nets → 478×3 assembly with the
  canonical index layout (468 R-iris centre, 469-472 R boundary, 473
  L centre, 474-477 L boundary — matching FACEMESH_LEFT/RIGHT_IRIS and the
  reference's tables detectors.py:19-20). Entirely jit-compatible: ROI
  crops are gather-based bilinear samples at static 64×64 shape.

All activations are per-channel PReLU (what the TFLite graphs ship);
BlazeFace (models/blazeface.py) keeps plain ReLU per its paper.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.models.layers import MPBlock, PReLU
from depth_estimation_tpu.ops.sampling import crop_resize_bilinear

NUM_LANDMARKS = 478  # 468 mesh + 10 iris refinement points
NUM_MESH_LANDMARKS = 468
INPUT_SIZE = 192
IRIS_INPUT_SIZE = 64

# eye-corner mesh indices used to build the iris ROIs (MediaPipe's
# iris-landmark graph crops between these corners, scaled 2.3×):
# subject-right eye = image-left (outer 33, inner 133), subject-left eye
# (inner 362, outer 263)
RIGHT_EYE_CORNERS = (33, 133)
LEFT_EYE_CORNERS = (362, 263)
_ROI_SCALE = 2.3


class FaceMesh(nn.Module):
    """``face_landmark.tflite``: (B, 192, 192, 3) in [0, 1] →
    (landmarks (B, 468, 3) in crop pixels, face-presence probability (B,)).

    Backbone: conv 3→16 s2 + PReLU, then depthwise residual blocks
    16,16 | 32(s2),32,32 | 64(s2),64,64 | 128(s2),128,128 | 128(s2),128,128
    down to 6×6×128; two heads (landmarks / face flag), each
    block(s2)→3×3, 1×1 conv to 32 + PReLU, block, and a final 3×3 VALID
    conv collapsing 3×3 → 1×1×(1404 | 1).
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", name="stem")(x)
        h = PReLU(16, name="stem_act")(h)  # 96×96×16
        plan = [
            (16, 1), (16, 1),
            (32, 2), (32, 1), (32, 1),
            (64, 2), (64, 1), (64, 1),
            (128, 2), (128, 1), (128, 1),
            (128, 2), (128, 1), (128, 1),
        ]
        for i, (wdt, s) in enumerate(plan):
            h = MPBlock(wdt, strides=s, name=f"block_{i}")(h)
        # h: (B, 6, 6, 128)

        def head(h, out_ch, tag):
            h = MPBlock(128, strides=2, name=f"{tag}_block_a")(h)  # 3×3
            h = nn.Conv(32, (1, 1), name=f"{tag}_conv")(h)
            h = PReLU(32, name=f"{tag}_act")(h)
            h = MPBlock(32, strides=1, name=f"{tag}_block_b")(h)
            h = nn.Conv(out_ch, (3, 3), padding="VALID", name=f"{tag}_out")(h)
            return h.reshape(h.shape[0], -1)

        lm = head(h, NUM_MESH_LANDMARKS * 3, "coord").reshape(
            -1, NUM_MESH_LANDMARKS, 3
        )
        score = head(h, 1, "conf")[:, 0]
        return lm, jnp.reciprocal(1.0 + jnp.exp(-score))


class IrisBlock(nn.Module):
    """Bottleneck depthwise block of ``iris_landmark.tflite``: 1×1 (or 2×2,
    stride 2) conv to out/2 + PReLU → 3×3 depthwise → 1×1 expand, residual
    with max-pool/channel-pad, PReLU."""

    out_features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        mid = self.out_features // 2
        k = self.strides  # 1×1 for stride 1, 2×2 for stride 2
        h = nn.Conv(mid, (k, k), strides=(self.strides, self.strides),
                    padding="VALID", name="conv_squeeze")(x)
        h = PReLU(mid, name="act_squeeze")(h)
        h = nn.Conv(mid, (3, 3), padding="SAME", feature_group_count=mid,
                    name="conv_dw")(h)
        h = nn.Conv(self.out_features, (1, 1), name="conv_expand")(h)
        if self.strides == 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.out_features > in_f:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, self.out_features - in_f)))
        return PReLU(self.out_features, name="act")(h + x)


class IrisLandmark(nn.Module):
    """``iris_landmark.tflite``: (B, 64, 64, 3) in [0, 1] →
    (eye contour (B, 71, 3), iris (B, 5, 3)) in crop-pixel units.

    Shared backbone to 8×8×128, then two symmetric branches (eye / iris)
    each descending to 1×1 via stride-2 blocks and a final 2×2 VALID conv.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME", name="stem")(x)
        h = PReLU(64, name="stem_act")(h)  # 32×32×64
        for i in range(4):
            h = IrisBlock(64, name=f"back_a_{i}")(h)
        h = IrisBlock(128, strides=2, name="back_down1")(h)  # 16
        for i in range(4):
            h = IrisBlock(128, name=f"back_b_{i}")(h)
        h = IrisBlock(128, strides=2, name="back_down2")(h)  # 8
        for i in range(4):
            h = IrisBlock(128, name=f"back_c_{i}")(h)

        def branch(h, out_ch, tag):
            h = IrisBlock(128, strides=2, name=f"{tag}_down1")(h)  # 4
            h = IrisBlock(128, name=f"{tag}_a")(h)
            h = IrisBlock(128, name=f"{tag}_b")(h)
            h = IrisBlock(128, strides=2, name=f"{tag}_down2")(h)  # 2
            h = IrisBlock(128, name=f"{tag}_c")(h)
            h = IrisBlock(128, name=f"{tag}_d")(h)
            h = nn.Conv(out_ch, (2, 2), padding="VALID", name=f"{tag}_out")(h)
            return h.reshape(h.shape[0], -1)

        eye = branch(h, 71 * 3, "eye").reshape(-1, 71, 3)
        iris = branch(h, 5 * 3, "iris").reshape(-1, 5, 3)
        return eye, iris


def _eye_rois(lm: jnp.ndarray, corners: Tuple[int, int], crop_size: float):
    """Batched square ROIs (x0, y0, side), each (B,), around an eye from its
    corner landmarks, scaled ×2.3 like MediaPipe's iris graph; clamped
    inside the face crop."""
    p0 = lm[:, corners[0], :2]
    p1 = lm[:, corners[1], :2]
    center = (p0 + p1) / 2.0
    side = jnp.linalg.norm(p1 - p0, axis=-1) * _ROI_SCALE
    side = jnp.clip(side, 8.0, crop_size)
    x0 = jnp.clip(center[:, 0] - side / 2.0, 0.0, crop_size - side)
    y0 = jnp.clip(center[:, 1] - side / 2.0, 0.0, crop_size - side)
    return x0, y0, side


class FaceMeshWithIris(nn.Module):
    """refine_landmarks=True contract: (B, 192, 192, 3) in [0, 1] →
    (landmarks (B, 478, 3) in crop pixels, face-presence probability (B,)).

    The 468-point mesh is refined with iris points from ``IrisLandmark``
    applied to eye ROIs cropped out of the SAME 192×192 input (one batched
    iris inference covering both eyes of every face; the right eye is
    mirrored — the iris net is trained on left eyes). Everything is
    static-shaped: runs as one XLA program per face crop.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        import jax

        mesh_net = FaceMesh(name="mesh")
        iris_net = IrisLandmark(name="iris")
        lm, score = mesh_net(x)
        B = x.shape[0]

        rx0, ry0, rs = _eye_rois(lm, RIGHT_EYE_CORNERS, float(INPUT_SIZE))
        lx0, ly0, ls = _eye_rois(lm, LEFT_EYE_CORNERS, float(INPUT_SIZE))
        out_hw = (IRIS_INPUT_SIZE, IRIS_INPUT_SIZE)
        crop = jax.vmap(crop_resize_bilinear, in_axes=(0, 0, None))
        r_crop = crop(x, jnp.stack([rx0, ry0, rs], axis=-1), out_hw)
        l_crop = crop(x, jnp.stack([lx0, ly0, ls], axis=-1), out_hw)
        r_crop = r_crop[:, :, ::-1, :]  # mirror the right eye (width axis)

        eyes = jnp.concatenate([r_crop, l_crop], axis=0)  # (2B, 64, 64, 3)
        _contour, iris = iris_net(eyes)  # (2B, 5, 3)
        r_iris, l_iris = iris[:B], iris[B:]
        # un-mirror the right eye x
        r_iris = r_iris.at[:, :, 0].set(IRIS_INPUT_SIZE - r_iris[:, :, 0])

        def to_crop(pts, x0, y0, side):
            s = (side / IRIS_INPUT_SIZE)[:, None]
            return jnp.stack(
                [x0[:, None] + pts[:, :, 0] * s,
                 y0[:, None] + pts[:, :, 1] * s,
                 pts[:, :, 2] * s], axis=-1)

        r_pts = to_crop(r_iris, rx0, ry0, rs)
        l_pts = to_crop(l_iris, lx0, ly0, ls)
        # canonical layout: 468 R centre, 469-472 R boundary, 473 L centre,
        # 474-477 L boundary (matches FACEMESH_LEFT/RIGHT_IRIS index sets)
        full = jnp.concatenate([lm, r_pts, l_pts], axis=1)  # (B, 478, 3)
        return full, score
