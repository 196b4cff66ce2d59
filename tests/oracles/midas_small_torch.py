"""Functional torch oracle for MiDaS-small (test-only).

Implements the reference network's math directly with torch functional ops,
reading weights from a state dict in the *hub naming scheme* — so a single
random state dict drives both this oracle and our converter+Flax model, and
agreement proves architecture + conversion simultaneously.

TF-SAME padding is computed explicitly (the hub encoder is
tf_efficientnet_lite3 with TF-style asymmetric padding).
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

from depth_estimation_tpu.models.efficientnet_lite import LITE3_STAGES
from depth_estimation_tpu.utils.convert import lite3_hub_prefix, midas_small_expected_keys

BN_EPS = 1e-3  # tf_ variants


def make_random_state_dict(seed=0):
    """Random state dict with authentic hub key names and shapes."""
    g = torch.Generator().manual_seed(seed)

    sd = {}

    def conv(key, out_c, in_c, k, groups=1):
        sd[key + ".weight"] = torch.randn(out_c, in_c // groups, k, k, generator=g) * (
            1.0 / math.sqrt(in_c * k * k / groups)
        )

    def bias(key, c):
        sd[key + ".bias"] = torch.randn(c, generator=g) * 0.05

    def bn(key, c):
        sd[key + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[key + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[key + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[key + ".running_var"] = torch.rand(c, generator=g) + 0.5

    # encoder
    conv("pretrained.layer1.0", 32, 3, 3)
    bn("pretrained.layer1.1", 32)
    in_c = 32
    for si, (btype, reps, k, s, e, out_c) in enumerate(LITE3_STAGES):
        for bi in range(reps):
            p = lite3_hub_prefix(si, bi)
            if btype == "ds":
                conv(p + ".conv_dw", in_c, in_c, k, groups=in_c)
                bn(p + ".bn1", in_c)
                conv(p + ".conv_pw", out_c, in_c, 1)
                bn(p + ".bn2", out_c)
            else:
                mid = in_c * e
                conv(p + ".conv_pw", mid, in_c, 1)
                bn(p + ".bn1", mid)
                conv(p + ".conv_dw", mid, mid, k, groups=mid)
                bn(p + ".bn2", mid)
                conv(p + ".conv_pwl", out_c, mid, 1)
                bn(p + ".bn3", out_c)
            in_c = out_c

    # decoder
    enc_ch = {"layer1": 32, "layer2": 48, "layer3": 136, "layer4": 384}
    feats = 64
    for i, (layer, ec) in enumerate(
        [("layer1", 32), ("layer2", 48), ("layer3", 136), ("layer4", 384)], start=1
    ):
        conv(f"scratch.layer{i}_rn", feats * 2 ** (i - 1), ec, 3)
    ffb_feats = {"refinenet4": 512, "refinenet3": 256, "refinenet2": 128, "refinenet1": 64}
    ffb_out = {"refinenet4": 256, "refinenet3": 128, "refinenet2": 64, "refinenet1": 64}
    for rn, c in ffb_feats.items():
        units = ("resConfUnit2",) if rn == "refinenet4" else ("resConfUnit1", "resConfUnit2")
        for u in units:
            for cv in ("conv1", "conv2"):
                conv(f"scratch.{rn}.{u}.{cv}", c, c, 3)
                bias(f"scratch.{rn}.{u}.{cv}", c)
        conv(f"scratch.{rn}.out_conv", ffb_out[rn], c, 1)
        bias(f"scratch.{rn}.out_conv", ffb_out[rn])
    conv("scratch.output_conv.0", 32, 64, 3)
    bias("scratch.output_conv.0", 32)
    conv("scratch.output_conv.2", 32, 32, 3)
    bias("scratch.output_conv.2", 32)
    conv("scratch.output_conv.4", 1, 32, 1)
    bias("scratch.output_conv.4", 1)

    missing = set(midas_small_expected_keys()) - set(sd)
    extra = set(sd) - set(midas_small_expected_keys())
    assert not missing, f"oracle dict missing keys: {sorted(missing)[:5]}"
    assert not extra, f"oracle dict has extra keys: {sorted(extra)[:5]}"
    return sd


def tf_same_conv(x, w, stride=1, groups=1):
    """F.conv2d with TF-SAME (asymmetric) padding."""
    ih, iw = x.shape[-2:]
    kh, kw = w.shape[-2:]
    ph = max((math.ceil(ih / stride) - 1) * stride + kh - ih, 0)
    pw = max((math.ceil(iw / stride) - 1) * stride + kw - iw, 0)
    x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return F.conv2d(x, w, stride=stride, groups=groups)


def _bn(x, sd, p):
    return F.batch_norm(
        x, sd[p + ".running_mean"], sd[p + ".running_var"],
        sd[p + ".weight"], sd[p + ".bias"], training=False, eps=BN_EPS,
    )


def _relu6(x):
    return x.clamp(0.0, 6.0)


def _encoder(sd, x):
    x = tf_same_conv(x, sd["pretrained.layer1.0.weight"], stride=2)
    x = _relu6(_bn(x, sd, "pretrained.layer1.1"))
    feats = {}
    taps = {1: "layer1", 2: "layer2", 4: "layer3", 6: "layer4"}
    for si, (btype, reps, k, s, e, out_c) in enumerate(LITE3_STAGES):
        for bi in range(reps):
            p = lite3_hub_prefix(si, bi)
            stride = s if bi == 0 else 1
            residual = x
            if btype == "ds":
                x = tf_same_conv(x, sd[p + ".conv_dw.weight"], stride=stride, groups=x.shape[1])
                x = _relu6(_bn(x, sd, p + ".bn1"))
                x = F.conv2d(x, sd[p + ".conv_pw.weight"])
                x = _bn(x, sd, p + ".bn2")
            else:
                x = F.conv2d(x, sd[p + ".conv_pw.weight"])
                x = _relu6(_bn(x, sd, p + ".bn1"))
                x = tf_same_conv(x, sd[p + ".conv_dw.weight"], stride=stride, groups=x.shape[1])
                x = _relu6(_bn(x, sd, p + ".bn2"))
                x = F.conv2d(x, sd[p + ".conv_pwl.weight"])
                x = _bn(x, sd, p + ".bn3")
            if stride == 1 and residual.shape[1] == x.shape[1]:
                x = x + residual
        if si in taps:
            feats[taps[si]] = x
    return feats


def _rcu(sd, p, x):
    h = F.relu(x)
    h = F.conv2d(h, sd[p + ".conv1.weight"], sd[p + ".conv1.bias"], padding=1)
    h = F.relu(h)
    h = F.conv2d(h, sd[p + ".conv2.weight"], sd[p + ".conv2.bias"], padding=1)
    return h + x


def _ffb(sd, p, x, skip=None):
    h = x
    if skip is not None:
        h = h + _rcu(sd, p + ".resConfUnit1", skip)
    h = _rcu(sd, p + ".resConfUnit2", h)
    h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
    return F.conv2d(h, sd[p + ".out_conv.weight"], sd[p + ".out_conv.bias"])


def forward(sd, x_nchw):
    """Full MidasNet_small forward. x: (B,3,H,W) float tensor. → (B,H,W)."""
    with torch.no_grad():
        feats = _encoder(sd, x_nchw)
        rn = {
            i: F.conv2d(feats[f"layer{i}"], sd[f"scratch.layer{i}_rn.weight"], padding=1)
            for i in (1, 2, 3, 4)
        }
        p4 = _ffb(sd, "scratch.refinenet4", rn[4])
        p3 = _ffb(sd, "scratch.refinenet3", p4, rn[3])
        p2 = _ffb(sd, "scratch.refinenet2", p3, rn[2])
        p1 = _ffb(sd, "scratch.refinenet1", p2, rn[1])
        h = F.conv2d(p1, sd["scratch.output_conv.0.weight"], sd["scratch.output_conv.0.bias"], padding=1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=False)
        h = F.conv2d(h, sd["scratch.output_conv.2.weight"], sd["scratch.output_conv.2.bias"], padding=1)
        h = F.relu(h)
        h = F.conv2d(h, sd["scratch.output_conv.4.weight"], sd["scratch.output_conv.4.bias"])
        h = F.relu(h)
        return h[:, 0]
