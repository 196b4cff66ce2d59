"""Model registry: name string → (module factory, preprocess, converter).

Replaces the reference's name-based torch.hub dispatch
(``torch.hub.load("intel-isl/MiDaS", model_type)`` + transform selection,
depth_midas.py:10-16) with an explicit registry. Names match the reference
exactly: "DPT_Large", "DPT_Hybrid", "MiDaS_small", plus the hub-era "MiDaS"
(v2.1 Large) — the reference's dispatch special-cases only the DPT names, so
"MiDaS" reaches its small_transform branch (depth_midas.py:13-16), mirrored
here by giving it SMALL_PREPROCESS (docs/PARITY.md).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

from depth_estimation_tpu.config import (
    DPT_PREPROCESS,
    SMALL_PREPROCESS,
    PreprocessConfig,
)


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str
    make_model: Callable
    preprocess: PreprocessConfig
    convert: Callable  # torch hub state dict -> flax params
    # matmul/conv precision for f32 inference that passes the 1e-3 accuracy
    # gate on TPU (measured vs torch oracles, tools/accuracy_gate.py). The
    # 16-bottleneck ResNetV2 stem of DPT_Hybrid accumulates past 1e-3 at
    # 'high' (2.8e-3) and needs 'highest' (2.4e-4).
    f32_precision: str = "high"


def _make_midas_small():
    from depth_estimation_tpu.models.midas_small import MidasSmall

    return MidasSmall()


def _make_dpt_large():
    from depth_estimation_tpu.models.dpt import DPT, DPT_LARGE

    return DPT(DPT_LARGE)


def _make_dpt_hybrid():
    import dataclasses

    from depth_estimation_tpu.models.dpt import DPT, DPT_HYBRID

    # Section-mixed f32 precision (round-4 bisect, tools/precision_bisect.py
    # --model dpt_hybrid): only the ResNetV2 stem needs 6-pass 'highest'
    # (it accumulates 2.8e-3 at 'high'); the ViT-B trunk and the decoder
    # gate-PASS at 3-pass 'high' (3.46e-4 vs the 1e-3 threshold), halving
    # their matmul work. The ambient registry f32_precision stays 'highest'
    # and covers exactly the stem, which has no per-section override.
    return DPT(dataclasses.replace(
        DPT_HYBRID, dot_precision="high", decoder_precision="high"))


def _make_midas_v21():
    from depth_estimation_tpu.models.midas_v21 import MidasV21

    return MidasV21()


def _convert_small(sd):
    from depth_estimation_tpu.utils.convert import convert_midas_small

    return convert_midas_small(sd)


def _convert_midas_v21(sd):
    from depth_estimation_tpu.utils.convert import convert_midas_v21

    return convert_midas_v21(sd)


def _convert_dpt_large(sd):
    from depth_estimation_tpu.models.dpt import DPT_LARGE
    from depth_estimation_tpu.utils.convert import convert_dpt

    return convert_dpt(sd, DPT_LARGE)


def _convert_dpt_hybrid(sd):
    from depth_estimation_tpu.models.dpt import DPT_HYBRID
    from depth_estimation_tpu.utils.convert import convert_dpt

    return convert_dpt(sd, DPT_HYBRID)


_REGISTRY: Dict[str, ModelEntry] = {
    "MiDaS_small": ModelEntry("MiDaS_small", _make_midas_small, SMALL_PREPROCESS, _convert_small),
    "MiDaS": ModelEntry("MiDaS", _make_midas_v21, SMALL_PREPROCESS, _convert_midas_v21),
    "DPT_Large": ModelEntry("DPT_Large", _make_dpt_large, DPT_PREPROCESS, _convert_dpt_large),
    "DPT_Hybrid": ModelEntry(
        "DPT_Hybrid", _make_dpt_hybrid, DPT_PREPROCESS, _convert_dpt_hybrid, f32_precision="highest"
    ),
}


def get_entry(model_type: str) -> ModelEntry:
    try:
        return _REGISTRY[model_type]
    except KeyError:
        raise ValueError(
            f"unknown model_type {model_type!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available_models():
    return sorted(_REGISTRY)


def register(entry: ModelEntry) -> None:
    _REGISTRY[entry.name] = entry
