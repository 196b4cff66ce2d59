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

from typing import Dict, List, Mapping, Tuple

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


# -- MiDaS v2.1 Large ("MiDaS") ----------------------------------------------

def resnext_hub_prefix(layer: int, block: int) -> str:
    """Hub state-dict prefix for ResNeXt bottleneck (layer, idx).

    MiDaS `_make_resnet_backbone` wraps the torchvision stem into
    pretrained.layer1 = Sequential[conv1, bn1, relu, maxpool, resnet.layer1];
    layers 2-4 are the torchvision layers verbatim.
    """
    if layer == 1:
        return f"pretrained.layer1.4.{block}"
    return f"pretrained.layer{layer}.{block}"


def convert_midas_v21(sd: StateDict, cfg=None) -> Dict:
    """Hub MidasNet (v2.1 Large) state dict → Flax params for MidasV21.

    Real checkpoints also carry scratch.refinenet4.resConfUnit1.* — the v2.1
    FeatureFusionBlock constructs both units but the top block never receives
    a skip, so those params are dead in the forward; they are ignored here
    (like num_batches_tracked buffers).
    """
    from depth_estimation_tpu.models.midas_v21 import MIDAS_V21

    cfg = cfg or MIDAS_V21
    enc: Dict[str, Dict] = {
        "conv1": _conv(sd, "pretrained.layer1.0", bias=False),
        "bn1": _bn(sd, "pretrained.layer1.1"),
    }
    for li, depth in enumerate(cfg.depths, start=1):
        for bi in range(depth):
            p = resnext_hub_prefix(li, bi)
            blk = {
                "conv1": _conv(sd, f"{p}.conv1", bias=False),
                "bn1": _bn(sd, f"{p}.bn1"),
                "conv2": _conv(sd, f"{p}.conv2", bias=False),
                "bn2": _bn(sd, f"{p}.bn2"),
                "conv3": _conv(sd, f"{p}.conv3", bias=False),
                "bn3": _bn(sd, f"{p}.bn3"),
            }
            if bi == 0:
                blk["downsample_conv"] = _conv(sd, f"{p}.downsample.0", bias=False)
                blk["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            enc[f"layer{li}_block{bi}"] = blk

    def rcu(prefix: str) -> Dict:
        return {
            "conv1": _conv(sd, f"{prefix}.conv1"),
            "conv2": _conv(sd, f"{prefix}.conv2"),
        }

    def ffb(prefix: str, has_rcu1: bool) -> Dict:
        out = {"resConfUnit2": rcu(f"{prefix}.resConfUnit2")}
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


def midas_v21_expected_keys(cfg=None) -> List[str]:
    """Every hub key convert_midas_v21 consumes (real checkpoints may carry
    extras: dead refinenet4.resConfUnit1, num_batches_tracked buffers)."""
    from depth_estimation_tpu.models.midas_v21 import MIDAS_V21

    cfg = cfg or MIDAS_V21
    bn_suffixes = ("weight", "bias", "running_mean", "running_var")
    keys = ["pretrained.layer1.0.weight"]
    keys += [f"pretrained.layer1.1.{s}" for s in bn_suffixes]
    for li, depth in enumerate(cfg.depths, start=1):
        for bi in range(depth):
            p = resnext_hub_prefix(li, bi)
            keys += [f"{p}.conv{i}.weight" for i in (1, 2, 3)]
            for b in ("bn1", "bn2", "bn3"):
                keys += [f"{p}.{b}.{s}" for s in bn_suffixes]
            if bi == 0:
                keys.append(f"{p}.downsample.0.weight")
                keys += [f"{p}.downsample.1.{s}" for s in bn_suffixes]
    for i in (1, 2, 3, 4):
        keys.append(f"scratch.layer{i}_rn.weight")
    for rn in ("refinenet1", "refinenet2", "refinenet3", "refinenet4"):
        units = ("resConfUnit2",) if rn == "refinenet4" else ("resConfUnit1", "resConfUnit2")
        for u in units:
            for c in ("conv1", "conv2"):
                keys += [f"scratch.{rn}.{u}.{c}.weight", f"scratch.{rn}.{u}.{c}.bias"]
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


# -- TFLite → Flax structural conversion (MediaPipe detector stack) -----------
#
# The detector weights ship as .tflite flatbuffers (mediapipe 0.8.11, the
# reference's requirements.txt:2). Tensor names in those files are generated
# converter artifacts, so conversion keys on STRUCTURE instead: the operator
# stream in execution order (utils/tflite.py::read_tflite_ops) is matched
# against the Flax model's weight layers in TRUE execution order, captured
# by tracing init under an nn.intercept_methods interceptor (param-dict
# iteration order cannot be used — flax sorts keys alphabetically). Every
# assignment is shape-checked after layout transposition, so importing a
# real file either proves the architecture matches layer-for-layer or fails
# with a precise diagnostic naming the first divergent layer.
#
# Layout rules:
#   CONV_2D kernel             (O, H, W, I)  → HWIO  transpose (1, 2, 3, 0)
#   DEPTHWISE_CONV_2D kernel   (1, H, W, C)  → (H, W, 1, C)  transpose (1, 2, 0, 3)
#   FULLY_CONNECTED kernel     (out, in)     → (in, out)
#   PRELU alpha                (..., C)      → (C,)

_TFLITE_WEIGHT_OPS = {"CONV_2D", "DEPTHWISE_CONV_2D", "FULLY_CONNECTED", "PRELU"}


def tflite_weight_layers(ops, consts) -> List[Tuple[str, Array, Array]]:
    """[(kind, kernel/alpha, bias-or-None), ...] in execution order."""
    out = []
    for op in ops:
        if op.op not in _TFLITE_WEIGHT_OPS:
            continue
        kernel = consts.get(op.inputs[1]) if len(op.inputs) > 1 else None
        if kernel is None:
            continue  # dynamic weights (never the case in these models)
        bias = None
        if op.op != "PRELU" and len(op.inputs) > 2 and op.inputs[2] >= 0:
            bias = consts.get(op.inputs[2])
        out.append((op.op, np.asarray(kernel), None if bias is None else np.asarray(bias)))
    return out


def flax_layer_order(model, input_shape) -> Tuple[List[Tuple[str, ...]], Dict]:
    """(execution-ordered weight-layer paths, zero param template).

    Order is captured by tracing ``model.init`` under shape evaluation with
    an interceptor that records every Conv/Dense/PReLU call — the only
    reliable source of graph order (flax param dicts are key-sorted).
    """
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from depth_estimation_tpu.models.layers import PReLU

    order: List[Tuple[str, ...]] = []

    def interceptor(next_fn, args, kwargs, context):
        if context.method_name == "__call__" and isinstance(
            context.module, (nn.Conv, nn.ConvTranspose, nn.Dense, PReLU)
        ):
            path = tuple(context.module.path)
            if path not in order:
                order.append(path)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros(input_shape, jnp.float32)
        )
    template = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)[
        "params"
    ]
    return order, template


def _convert_layer(kind: str, kernel: Array, slot_kernel_shape) -> Array:
    if kind == "CONV_2D":
        k = kernel.transpose(1, 2, 3, 0)
    elif kind == "DEPTHWISE_CONV_2D":
        k = kernel.transpose(1, 2, 0, 3)
        if k.shape != tuple(slot_kernel_shape) and k.shape[2] != 1:
            # channel-multiplier layout variant
            k = kernel.reshape(kernel.shape[1], kernel.shape[2], 1, -1)
    elif kind == "FULLY_CONNECTED":
        k = kernel.T
    else:  # PRELU
        k = kernel.reshape(-1)
    return k


def _slot_expected_kind(leaf) -> str:
    if "alpha" in leaf:
        return "PRELU"
    ndim = np.ndim(leaf["kernel"])
    return "FULLY_CONNECTED" if ndim == 2 else "CONV_2D"


def _op_matches_slot(kind, converted_kernel, bias, leaf, want_kernel) -> bool:
    """Full structural-agreement predicate: kernel shape, PReLU-vs-conv kind,
    AND bias structure (presence + shape). Bias agreement is part of the
    match — not a post-bind assertion — so a shape-coincident conv from a
    graph branch the Flax model doesn't implement cannot bind to a slot
    whose bias layout it doesn't share."""
    if converted_kernel.shape != want_kernel.shape:
        return False
    if ("alpha" in leaf) != (kind == "PRELU"):
        return False
    if "alpha" not in leaf:
        if ("bias" in leaf) != (bias is not None):
            return False
        if bias is not None and bias.shape != np.asarray(leaf["bias"]).shape:
            return False
    return True


def assign_tflite_weights(
    ops, consts, model, input_shape, model_name: str = "?", allow_skips: bool = False
) -> Dict:
    """Map a TFLite op stream onto ``model``'s param tree structurally.

    For each weight layer (in true execution order, flax_layer_order) the
    next compatible weight op is consumed. By default every weight-bearing
    op must be consumed in order (``allow_skips=False``): a foreign op in
    the stream raises instead of being silently jumped — this is what makes
    a successful conversion *prove* the architecture layer-for-layer. For
    graphs that carry whole branches the Flax model deliberately omits
    (e.g. the pose segmentation decoder), pass ``allow_skips=True``; each
    skipped weight op is then reported via ``warnings.warn`` so a
    mis-matched stream is never silent. Any slot that cannot be filled
    raises with a diagnostic naming the layer.
    """
    import jax

    layers = tflite_weight_layers(ops, consts)
    order, template = flax_layer_order(model, input_shape)
    slots = []
    for path in order:
        node = template
        for p in path:
            node = node[p]
        slots.append((path, node))
    out = jax.tree_util.tree_map(np.asarray, template)
    pos = 0
    skipped: List[Tuple[int, str]] = []
    for path, leaf in slots:
        want_kernel = np.asarray(leaf["kernel"] if "kernel" in leaf else leaf["alpha"])
        found = None
        search_end = len(layers) if allow_skips else min(pos + 1, len(layers))
        for j in range(pos, search_end):
            kind, kernel, bias = layers[j]
            k = _convert_layer(kind, kernel, want_kernel.shape)
            if _op_matches_slot(kind, k, bias, leaf, want_kernel):
                found = (j, kind, k, bias)
                break
        if found is None:
            got = (
                f"next op is {layers[pos][0]} kernel {layers[pos][1].shape}"
                if pos < len(layers)
                else "op stream exhausted"
            )
            raise ValueError(
                f"{model_name}: no TFLite weight matches layer {'/'.join(path)} "
                f"(expected kernel shape {want_kernel.shape}; {got}; "
                f"position {pos}/{len(layers)}"
                + ("" if allow_skips else "; strict in-order matching — "
                   "pass allow_skips=True only for graphs with known extra branches")
                + ")"
            )
        j, kind, k, bias = found
        skipped.extend((i, layers[i][0]) for i in range(pos, j))
        pos = j + 1
        node = out
        for p in path[:-1]:
            node = node[p]
        leaf_name = path[-1]
        if "alpha" in leaf:
            node[leaf_name] = {"alpha": k.astype(np.float32)}
        else:
            new = {"kernel": k.astype(np.float32)}
            if "bias" in leaf:
                new["bias"] = bias.astype(np.float32)
            node[leaf_name] = new
    if skipped:
        import warnings

        warnings.warn(
            f"{model_name}: skipped {len(skipped)} weight op(s) from branches "
            f"the Flax model does not implement: "
            f"{[(i, kd) for i, kd in skipped[:8]]}"
            + ("..." if len(skipped) > 8 else ""),
            stacklevel=2,
        )
    return out


def _read_ops(path: str):
    from depth_estimation_tpu.utils.tflite import read_tflite_ops

    return read_tflite_ops(path)


def convert_blazeface_tflite(path: str) -> Dict:
    """face_detection_short_range.tflite → BlazeFace params."""
    from depth_estimation_tpu.models.blazeface import BlazeFace

    ops, consts, _ = _read_ops(path)
    return assign_tflite_weights(ops, consts, BlazeFace(), (1, 128, 128, 3), "BlazeFace")


def convert_facemesh_tflite(face_path: str, iris_path: str) -> Dict:
    """face_landmark.tflite + iris_landmark.tflite → FaceMeshWithIris params."""
    from depth_estimation_tpu.models.facemesh import FaceMesh, IrisLandmark

    f_ops, f_consts, _ = _read_ops(face_path)
    i_ops, i_consts, _ = _read_ops(iris_path)
    mesh = assign_tflite_weights(
        f_ops, f_consts, FaceMesh(), (1, 192, 192, 3), "FaceMesh"
    )
    iris = assign_tflite_weights(
        i_ops, i_consts, IrisLandmark(), (1, 64, 64, 3), "IrisLandmark"
    )
    return {"mesh": mesh, "iris": iris}


def convert_blazepose_detector_tflite(path: str) -> Dict:
    """pose_detection.tflite → BlazePoseDetector params."""
    from depth_estimation_tpu.models.blazepose import BlazePoseDetector

    ops, consts, _ = _read_ops(path)
    return assign_tflite_weights(
        ops, consts, BlazePoseDetector(), (1, 224, 224, 3), "BlazePoseDetector"
    )


def convert_blazepose_tflite(path: str) -> Dict:
    """pose_landmark_{lite,full,heavy}.tflite → BlazePose params."""
    from depth_estimation_tpu.models.blazepose import BlazePose

    ops, consts, _ = _read_ops(path)
    # the real pose landmark graph carries segmentation/heatmap branches the
    # Flax model deliberately omits — skipping is expected here (and warned)
    return assign_tflite_weights(
        ops, consts, BlazePose(), (1, 256, 256, 3), "BlazePose", allow_skips=True
    )
