"""depth_estimation_tpu — a TPU-native (JAX/Flax/Pallas/pjit) monocular depth framework.

Re-designed from scratch with the capabilities of the reference pipeline
(juhoward/depth_estimation): MiDaS-small / DPT-Large / DPT-Hybrid monocular
depth networks, BlazeFace/FaceMesh/BlazePose person detectors, pinhole-camera
triangle-similarity geometry, and a streaming video runtime — all built
TPU-first (NHWC layouts, static shapes, XLA-fused preprocessing, Pallas
kernels for the hot ops, `jax.sharding` for multi-chip scale-out).

Public surface (mirrors the reference entry points):
  - ``DepthEstimator`` — name-selected depth model with ``.predict(bgr_u8)``
    (reference: depth_midas.py:6-35)
  - ``VidStream`` — streaming video orchestrators
    (reference: depth_midas.py:38-85, midas_mediapipe.py:11-159)
  - ``FaceDet`` — calibration + triangle-similarity geometry
    (reference: face.py:4-168)
  - ``PersonDetector`` / ``FaceDetector`` — detector wrappers
    (reference: detectors.py:6-124, depth_by_detection.py:12-124)
"""

from depth_estimation_tpu.version import __version__

__all__ = [
    "__version__",
    "DepthEstimator",
    "FaceDet",
    "PersonDetector",
    "FaceDetector",
    "VidStream",
    "MultiStream",
    "DepthServer",
    "FusedDepthServer",
    "BucketedDepthServer",
]


def __getattr__(name):  # lazy imports keep `import depth_estimation_tpu` cheap
    if name == "DepthEstimator":
        from depth_estimation_tpu.estimator import DepthEstimator

        return DepthEstimator
    if name == "FaceDet":
        from depth_estimation_tpu.geometry.face import FaceDet

        return FaceDet
    if name == "PersonDetector":
        from depth_estimation_tpu.detect.person_detector import PersonDetector

        return PersonDetector
    if name == "FaceDetector":
        from depth_estimation_tpu.detect.face_detector import FaceDetector

        return FaceDetector
    if name == "VidStream":
        from depth_estimation_tpu.runtime.stream import VidStream

        return VidStream
    if name == "MultiStream":
        from depth_estimation_tpu.runtime.multistream import MultiStream

        return MultiStream
    if name == "DepthServer":
        from depth_estimation_tpu.runtime.server import DepthServer

        return DepthServer
    if name == "FusedDepthServer":
        from depth_estimation_tpu.runtime.server import FusedDepthServer

        return FusedDepthServer
    if name == "BucketedDepthServer":
        from depth_estimation_tpu.runtime.server import BucketedDepthServer

        return BucketedDepthServer
    raise AttributeError(f"module 'depth_estimation_tpu' has no attribute {name!r}")
