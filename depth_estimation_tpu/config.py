"""Configuration system.

The reference has no config system at all — every knob is a hardcoded constant
(model_type strings depth_midas.py:91-93, video paths depth_midas.py:95-98,
camera constants face.py:17-19, detector confidences detectors.py:12,
landmark tables detectors.py:17-26, writer fps depth_midas.py:50). This module
introduces one; **defaults mirror the reference constants exactly** so the
default behavior matches.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Landmark index tables (reference: detectors.py:17-26)
# ---------------------------------------------------------------------------
LEFT_EYE = (362, 382, 381, 380, 374, 373, 390, 249, 263, 466, 388, 387, 386, 385, 384, 398)
RIGHT_EYE = (33, 7, 163, 144, 145, 153, 154, 155, 133, 173, 157, 158, 159, 160, 161, 246)
LEFT_IRIS = (474, 475, 476, 477)
RIGHT_IRIS = (469, 470, 471, 472)
# horizontal points (left, right), vertical points (top, bottom)
HEAD = (234, 454, 10, 152)
# body-pose head points (ears)
BODY_HEAD = (7, 8)
# raw pixel coordinates of the calibration credit card endpoints in the test
# footage (reference: detectors.py:26, face.py:22, depth_by_detection.py:185)
CARD = (505, 504, 675, 501)

# Physical constants (reference: face.py:17-19)
CREDIT_CARD_WIDTH_MM = 85.6
IRIS_DIAMETER_MM = 11.7
# depth_by_detection.py:192 uses a *different* card width (82.6) than face.py
# (85.6) — a reference inconsistency we preserve per-pipeline.
CARD_WIDTH_MM_DETECTION_PIPELINE = 82.6

# Calibration distance in inches (reference: face.py:24, midas_mediapipe.py:177)
CALIBRATION_DISTANCE_IN = 20


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """MiDaS input transform parameters.

    Mirrors the two torch.hub transforms selected at depth_midas.py:13-16:
    ``dpt_transform``  : 384 minimal resize, mean=std=0.5
    ``small_transform``: 256 upper_bound resize, ImageNet mean/std
    """

    target_height: int = 384
    target_width: int = 384
    resize_method: str = "minimal"  # "minimal" | "upper_bound" | "lower_bound"
    keep_aspect_ratio: bool = True
    ensure_multiple_of: int = 32
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    interpolation: str = "cubic"


DPT_PREPROCESS = PreprocessConfig()
SMALL_PREPROCESS = PreprocessConfig(
    target_height=256,
    target_width=256,
    resize_method="upper_bound",
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
)
# The hub's third transform (its own pairing for "MiDaS" v2.1 Large):
# 384 upper_bound, ImageNet stats. The REFERENCE never selects it — its
# non-DPT branch picks small_transform (depth_midas.py:13-16, PARITY #8b) —
# but the surface is exposed for hub-compat (transforms.default_transform).
DEFAULT_PREPROCESS = PreprocessConfig(
    target_height=384,
    target_width=384,
    resize_method="upper_bound",
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Depth model selection + compute options."""

    model_type: str = "DPT_Large"  # "DPT_Large" | "DPT_Hybrid" | "MiDaS_small"
    # f32 by default for numeric parity with the reference; bf16 is the
    # fast path on the MXU (flip for throughput once within tolerance).
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # Use the Pallas flash-attention kernel for ViT attention (DPT models).
    use_pallas_attention: bool = True


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Person/face detector parameters (reference: detectors.py:12, depth_by_detection.py:18)."""

    min_detection_confidence: float = 0.2
    mesh_min_detection_confidence: float = 0.5
    mesh_min_tracking_confidence: float = 0.5
    max_num_faces: int = 1
    refine_landmarks: bool = True
    # BlazeFace SSD decode/NMS
    nms_iou_threshold: float = 0.3
    max_detections: int = 16


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Video streaming parameters (reference: depth_midas.py:42-53)."""

    capture_buffer_size: int = 2
    target_fps: float = 30.0  # reference FPS = 1/30, depth_midas.py:45
    writer_fps: int = 20  # hardcoded in cv2.VideoWriter, depth_midas.py:50
    fourcc: str = "MJPG"
    # depth of the host->device prefetch pipeline (double buffering)
    prefetch_depth: int = 2


@dataclasses.dataclass(frozen=True)
class GeometryConfig:
    """Camera/geometry constants (reference: face.py:15-26)."""

    card_width_mm: float = CREDIT_CARD_WIDTH_MM
    iris_diameter_mm: float = IRIS_DIAMETER_MM
    calibration_distance_in: float = CALIBRATION_DISTANCE_IN
    card_points: Tuple[int, int, int, int] = CARD
    # Faithful mode reproduces the reference's depth-sampling quirks
    # (transposed indexing + asymmetric clamping, face.py:101-107).
    faithful: bool = True


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    detector: DetectorConfig = dataclasses.field(default_factory=DetectorConfig)
    stream: StreamConfig = dataclasses.field(default_factory=StreamConfig)
    geometry: GeometryConfig = dataclasses.field(default_factory=GeometryConfig)


def preprocess_for_model(model_type: str) -> PreprocessConfig:
    """Transform selection by model name (reference: depth_midas.py:13-16)."""
    if model_type in ("DPT_Large", "DPT_Hybrid"):
        return DPT_PREPROCESS
    return SMALL_PREPROCESS
