"""Functional torch oracle for MiDaS v2.1 Large ("MiDaS" hub name, test-only).

Implements the hub MidasNet math (ResNeXt-101 32x8d backbone + v2.1 fusion
decoder) directly with torch functional ops, reading weights from a state
dict in the *hub naming scheme* — so one random state dict drives both this
oracle and our converter + Flax model (depth_estimation_tpu/models/
midas_v21.py), and agreement proves architecture + conversion at once.

All convs use torch-style symmetric padding (torchvision ResNet), BN eps is
the torch default 1e-5. The v2.1 FeatureFusionBlock upsamples with
align_corners=True; the head's Interpolate uses align_corners=False.
"""

import math

import torch
import torch.nn.functional as F

from depth_estimation_tpu.models.midas_v21 import MIDAS_V21
from depth_estimation_tpu.utils.convert import (
    midas_v21_expected_keys,
    resnext_hub_prefix,
)

BN_EPS = 1e-5


def make_random_state_dict(cfg=MIDAS_V21, seed=0):
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

    # encoder stem
    conv("pretrained.layer1.0", cfg.stem_features, 3, 7)
    bn("pretrained.layer1.1", cfg.stem_features)

    in_c = cfg.stem_features
    for li, (depth, planes) in enumerate(zip(cfg.depths, cfg.planes), start=1):
        out_c = planes * cfg.expansion
        width = cfg.width(planes)
        for bi in range(depth):
            p = resnext_hub_prefix(li, bi)
            conv(p + ".conv1", width, in_c, 1)
            bn(p + ".bn1", width)
            conv(p + ".conv2", width, width, 3, groups=cfg.groups)
            bn(p + ".bn2", width)
            conv(p + ".conv3", out_c, width, 1)
            bn(p + ".bn3", out_c)
            if bi == 0:
                conv(p + ".downsample.0", out_c, in_c, 1)
                bn(p + ".downsample.1", out_c)
            in_c = out_c

    # scratch (decoder)
    f = cfg.features
    for i, planes in enumerate(cfg.planes, start=1):
        conv(f"scratch.layer{i}_rn", f, planes * cfg.expansion, 3)
    for rn in ("refinenet1", "refinenet2", "refinenet3", "refinenet4"):
        units = ("resConfUnit2",) if rn == "refinenet4" else ("resConfUnit1", "resConfUnit2")
        for u in units:
            for cv in ("conv1", "conv2"):
                conv(f"scratch.{rn}.{u}.{cv}", f, f, 3)
                bias(f"scratch.{rn}.{u}.{cv}", f)
    conv("scratch.output_conv.0", cfg.head_features, f, 3)
    bias("scratch.output_conv.0", cfg.head_features)
    conv("scratch.output_conv.2", cfg.head_mid, cfg.head_features, 3)
    bias("scratch.output_conv.2", cfg.head_mid)
    conv("scratch.output_conv.4", 1, cfg.head_mid, 1)
    bias("scratch.output_conv.4", 1)

    expected = set(midas_v21_expected_keys(cfg))
    missing = expected - set(sd)
    extra = set(sd) - expected
    assert not missing, f"oracle dict missing keys: {sorted(missing)[:5]}"
    assert not extra, f"oracle dict has extra keys: {sorted(extra)[:5]}"
    return sd


def _bn(x, sd, p):
    return F.batch_norm(
        x, sd[p + ".running_mean"], sd[p + ".running_var"],
        sd[p + ".weight"], sd[p + ".bias"], training=False, eps=BN_EPS,
    )


def _encoder(sd, x, cfg):
    x = F.conv2d(x, sd["pretrained.layer1.0.weight"], stride=2, padding=3)
    x = F.relu(_bn(x, sd, "pretrained.layer1.1"))
    x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)
    feats = {}
    for li, depth in enumerate(cfg.depths, start=1):
        for bi in range(depth):
            p = resnext_hub_prefix(li, bi)
            stride = 2 if (li > 1 and bi == 0) else 1
            if bi == 0:
                identity = _bn(
                    F.conv2d(x, sd[p + ".downsample.0.weight"], stride=stride),
                    sd, p + ".downsample.1",
                )
            else:
                identity = x
            h = F.relu(_bn(F.conv2d(x, sd[p + ".conv1.weight"]), sd, p + ".bn1"))
            h = F.relu(_bn(
                F.conv2d(h, sd[p + ".conv2.weight"], stride=stride, padding=1,
                         groups=cfg.groups),
                sd, p + ".bn2",
            ))
            h = _bn(F.conv2d(h, sd[p + ".conv3.weight"]), sd, p + ".bn3")
            x = F.relu(h + identity)
        feats[li] = x
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
    return F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)


def forward(sd, x_nchw, cfg=MIDAS_V21):
    """Full MidasNet v2.1 forward. x: (B,3,H,W) float tensor. → (B,H,W)."""
    with torch.no_grad():
        feats = _encoder(sd, x_nchw, cfg)
        rn = {
            i: F.conv2d(feats[i], sd[f"scratch.layer{i}_rn.weight"], padding=1)
            for i in (1, 2, 3, 4)
        }
        p4 = _ffb(sd, "scratch.refinenet4", rn[4])
        p3 = _ffb(sd, "scratch.refinenet3", p4, rn[3])
        p2 = _ffb(sd, "scratch.refinenet2", p3, rn[2])
        p1 = _ffb(sd, "scratch.refinenet1", p2, rn[1])
        h = F.conv2d(p1, sd["scratch.output_conv.0.weight"],
                     sd["scratch.output_conv.0.bias"], padding=1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=False)
        h = F.conv2d(h, sd["scratch.output_conv.2.weight"],
                     sd["scratch.output_conv.2.bias"], padding=1)
        h = F.relu(h)
        h = F.conv2d(h, sd["scratch.output_conv.4.weight"],
                     sd["scratch.output_conv.4.bias"])
        h = F.relu(h)
        return h[:, 0]
