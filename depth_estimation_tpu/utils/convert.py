"""PyTorch-hub → Flax weight conversion (N10 in SURVEY.md §2b).

The reference fetches weights at runtime via
``torch.hub.load("intel-isl/MiDaS", model_type)`` (depth_midas.py:10). Here
that becomes a one-time conversion of the hub checkpoint's state dict into
our NHWC Flax param trees, cached on disk (utils/checkpoint.py).

Layout rules:
  conv weight   OIHW → HWIO   (same transpose handles depthwise (C,1,kh,kw))
  linear weight (out,in) → (in,out)
  batchnorm     weight/bias/running_mean/running_var → scale/bias/mean/var

Naming: the maps below encode the *reference hub* state-dict naming
(MidasNet_small wraps the geffnet encoder stages into pretrained.layer1-4
Sequentials; decoder lives under scratch.*). They are exercised by the golden
tests, which generate state dicts in this exact naming and compare against a
functional torch oracle.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Mapping, Tuple

import numpy as np

from depth_estimation_tpu.models.efficientnet_lite import LITE3_STAGES

Array = np.ndarray
StateDict = Mapping[str, Array]


def t2f_conv(w: Array) -> Array:
    """torch conv weight (O, I, kH, kW) → flax kernel (kH, kW, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def t2f_linear(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _bn(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def _conv(sd: StateDict, prefix: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": t2f_conv(sd[f"{prefix}.weight"])}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


# -- MiDaS-small -------------------------------------------------------------

def lite3_hub_prefix(stage: int, block: int) -> str:
    """Hub state-dict prefix for encoder block (stage, idx).

    MiDaS `_make_efficientnet_backbone` regroups geffnet stages:
      layer1 = [conv_stem, bn1, act1, stage0, stage1]
      layer2 = [stage2]   layer3 = [stage3, stage4]   layer4 = [stage5, stage6]
    """
    table = {
        0: "pretrained.layer1.3",
        1: "pretrained.layer1.4",
        2: "pretrained.layer2.0",
        3: "pretrained.layer3.0",
        4: "pretrained.layer3.1",
        5: "pretrained.layer4.0",
        6: "pretrained.layer4.1",
    }
    if stage == 0:
        return f"{table[stage]}.{block}"  # single DS block at index 0
    return f"{table[stage]}.{block}"


def convert_midas_small(sd: StateDict) -> Dict:
    """Hub MidasNet_small state dict → Flax params for models.MidasSmall."""
    enc: Dict[str, Dict] = {
        "conv_stem": _conv(sd, "pretrained.layer1.0", bias=False),
        "bn1": _bn(sd, "pretrained.layer1.1"),
    }
    for si, (btype, reps, _k, _s, _e, _c) in enumerate(LITE3_STAGES):
        for bi in range(reps):
            p = lite3_hub_prefix(si, bi)
            if btype == "ds":
                enc[f"blocks_{si}_{bi}"] = {
                    "conv_dw": _conv(sd, f"{p}.conv_dw", bias=False),
                    "bn1": _bn(sd, f"{p}.bn1"),
                    "conv_pw": _conv(sd, f"{p}.conv_pw", bias=False),
                    "bn2": _bn(sd, f"{p}.bn2"),
                }
            else:
                enc[f"blocks_{si}_{bi}"] = {
                    "conv_pw": _conv(sd, f"{p}.conv_pw", bias=False),
                    "bn1": _bn(sd, f"{p}.bn1"),
                    "conv_dw": _conv(sd, f"{p}.conv_dw", bias=False),
                    "bn2": _bn(sd, f"{p}.bn2"),
                    "conv_pwl": _conv(sd, f"{p}.conv_pwl", bias=False),
                    "bn3": _bn(sd, f"{p}.bn3"),
                }

    def rcu(prefix: str) -> Dict:
        return {
            "conv1": _conv(sd, f"{prefix}.conv1"),
            "conv2": _conv(sd, f"{prefix}.conv2"),
        }

    def ffb(prefix: str, has_rcu1: bool) -> Dict:
        out = {
            "resConfUnit2": rcu(f"{prefix}.resConfUnit2"),
            "out_conv": _conv(sd, f"{prefix}.out_conv"),
        }
        if has_rcu1:
            out["resConfUnit1"] = rcu(f"{prefix}.resConfUnit1")
        return out

    params = {
        "pretrained": enc,
        "layer1_rn": _conv(sd, "scratch.layer1_rn", bias=False),
        "layer2_rn": _conv(sd, "scratch.layer2_rn", bias=False),
        "layer3_rn": _conv(sd, "scratch.layer3_rn", bias=False),
        "layer4_rn": _conv(sd, "scratch.layer4_rn", bias=False),
        "refinenet4": ffb("scratch.refinenet4", has_rcu1=False),
        "refinenet3": ffb("scratch.refinenet3", has_rcu1=True),
        "refinenet2": ffb("scratch.refinenet2", has_rcu1=True),
        "refinenet1": ffb("scratch.refinenet1", has_rcu1=True),
        "output_conv_0": _conv(sd, "scratch.output_conv.0"),
        "output_conv_2": _conv(sd, "scratch.output_conv.2"),
        "output_conv_4": _conv(sd, "scratch.output_conv.4"),
    }
    return params


def midas_small_expected_keys() -> List[str]:
    """Every hub state-dict key convert_midas_small consumes (for tests &
    for validating real checkpoints before conversion)."""
    keys = ["pretrained.layer1.0.weight"]
    keys += [f"pretrained.layer1.1.{s}" for s in ("weight", "bias", "running_mean", "running_var")]
    for si, (btype, reps, *_rest) in enumerate(LITE3_STAGES):
        for bi in range(reps):
            p = lite3_hub_prefix(si, bi)
            convs = ("conv_dw", "conv_pw") if btype == "ds" else ("conv_pw", "conv_dw", "conv_pwl")
            bns = ("bn1", "bn2") if btype == "ds" else ("bn1", "bn2", "bn3")
            keys += [f"{p}.{c}.weight" for c in convs]
            for b in bns:
                keys += [f"{p}.{b}.{s}" for s in ("weight", "bias", "running_mean", "running_var")]
    for i in (1, 2, 3, 4):
        keys.append(f"scratch.layer{i}_rn.weight")
    for rn in ("refinenet1", "refinenet2", "refinenet3", "refinenet4"):
        units = ("resConfUnit2",) if rn == "refinenet4" else ("resConfUnit1", "resConfUnit2")
        for u in units:
            for c in ("conv1", "conv2"):
                keys += [f"scratch.{rn}.{u}.{c}.weight", f"scratch.{rn}.{u}.{c}.bias"]
        keys += [f"scratch.{rn}.out_conv.weight", f"scratch.{rn}.out_conv.bias"]
    for i in (0, 2, 4):
        keys += [f"scratch.output_conv.{i}.weight", f"scratch.output_conv.{i}.bias"]
    return keys


# -- DPT (Large / Hybrid) ----------------------------------------------------

def t2f_deconv(w: Array) -> Array:
    """torch ConvTranspose2d weight (I, O, kH, kW) → flax ConvTranspose kernel
    (kH, kW, I, O) with spatial flip (empirically validated vs torch)."""
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _ln(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _dense(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"kernel": t2f_linear(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _gn(sd: StateDict, prefix: str) -> Dict[str, Dict[str, Array]]:
    return {"gn": {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}}


def convert_dpt(sd: StateDict, cfg=None) -> Dict:
    """Hub DPTDepthModel state dict → Flax params for models.DPT.

    Hub naming: transformer under ``pretrained.model.*`` (timm ViT), readout/
    reassemble under ``pretrained.act_postprocess1-4`` (Sequential indices:
    0=ProjectReadout, 3=1x1 conv, 4=resample), decoder under ``scratch.*``.
    """
    if cfg is None:
        from depth_estimation_tpu.models.dpt import DPT_LARGE

        cfg = DPT_LARGE
    hybrid = cfg.hybrid
    depth = cfg.depth
    vit: Dict = {
        "cls_token": np.asarray(sd["pretrained.model.cls_token"]),
        "pos_embed": np.asarray(sd["pretrained.model.pos_embed"]),
    }
    if not hybrid:
        vit["patch_embed"] = _conv(sd, "pretrained.model.patch_embed.proj")
    for i in range(depth):
        p = f"pretrained.model.blocks.{i}"
        vit[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "attn": {"qkv": _dense(sd, f"{p}.attn.qkv"), "proj": _dense(sd, f"{p}.attn.proj")},
            "norm2": _ln(sd, f"{p}.norm2"),
            "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"), "fc2": _dense(sd, f"{p}.mlp.fc2")},
        }

    params: Dict = {"vit": vit}

    # readout + reassemble: pyramid positions carrying transformer hooks
    positions = (2, 3) if hybrid else (0, 1, 2, 3)
    for pos in positions:
        app = f"pretrained.act_postprocess{pos + 1}"
        params[f"readout_{pos}"] = {"project": _dense(sd, f"{app}.0.project.0")}
        params[f"project_{pos}"] = _conv(sd, f"{app}.3")
        if pos == 0:
            params[f"resample_{pos}"] = {
                "kernel": t2f_deconv(sd[f"{app}.4.weight"]),
                "bias": np.asarray(sd[f"{app}.4.bias"]),
            }
        elif pos == 1:
            params[f"resample_{pos}"] = {
                "kernel": t2f_deconv(sd[f"{app}.4.weight"]),
                "bias": np.asarray(sd[f"{app}.4.bias"]),
            }
        elif pos == 3:
            params[f"resample_{pos}"] = _conv(sd, f"{app}.4")

    if hybrid:
        bb = "pretrained.model.patch_embed.backbone"
        stem: Dict = {
            "stem_conv": {"kernel": t2f_conv(sd[f"{bb}.stem.conv.weight"])},
            "stem_norm": _gn(sd, f"{bb}.stem.norm"),
        }
        for si, nblocks in enumerate((3, 4, 9)):
            for bi in range(nblocks):
                bp = f"{bb}.stages.{si}.blocks.{bi}"
                blk = {
                    "conv1": {"kernel": t2f_conv(sd[f"{bp}.conv1.weight"])},
                    "norm1": _gn(sd, f"{bp}.norm1"),
                    "conv2": {"kernel": t2f_conv(sd[f"{bp}.conv2.weight"])},
                    "norm2": _gn(sd, f"{bp}.norm2"),
                    "conv3": {"kernel": t2f_conv(sd[f"{bp}.conv3.weight"])},
                    "norm3": _gn(sd, f"{bp}.norm3"),
                }
                if bi == 0:
                    blk["downsample_conv"] = {"kernel": t2f_conv(sd[f"{bp}.downsample.conv.weight"])}
                    blk["downsample_norm"] = _gn(sd, f"{bp}.downsample.norm")
                stem[f"stage{si}_block{bi}"] = blk
        params["resnet_stem"] = stem
        params["patch_embed"] = _conv(sd, "pretrained.model.patch_embed.proj")

    for i in (1, 2, 3, 4):
        params[f"layer{i}_rn"] = _conv(sd, f"scratch.layer{i}_rn", bias=False)
    for rn_idx in (1, 2, 3, 4):
        rn = f"refinenet{rn_idx}"
        units = ("resConfUnit2",) if rn_idx == 4 else ("resConfUnit1", "resConfUnit2")
        block = {
            u: {"conv1": _conv(sd, f"scratch.{rn}.{u}.conv1"), "conv2": _conv(sd, f"scratch.{rn}.{u}.conv2")}
            for u in units
        }
        block["out_conv"] = _conv(sd, f"scratch.{rn}.out_conv")
        params[rn] = block
    for i in (0, 2, 4):
        params[f"output_conv_{i}"] = _conv(sd, f"scratch.output_conv.{i}")
    return params
