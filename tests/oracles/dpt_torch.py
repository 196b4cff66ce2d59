"""Functional torch oracle for DPT (non-hybrid), test-only.

Parameterized by DPTConfig so golden tests run at tiny scale on CPU; the
state dict uses the authentic hub naming (pretrained.model.* /
pretrained.act_postprocess* / scratch.*) so the converter is exercised on
the real schema.
"""

import math

import torch
import torch.nn.functional as F

from depth_estimation_tpu.models.dpt import DPTConfig


def make_random_state_dict(cfg: DPTConfig, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    C = cfg.embed_dim

    def t(key, *shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[-1] if len(shape) > 1 else 1)
        sd[key] = torch.randn(*shape, generator=g) * scale

    def linear(key, out_f, in_f):
        t(key + ".weight", out_f, in_f, scale=1.0 / math.sqrt(in_f))
        t(key + ".bias", out_f, scale=0.05)

    def conv(key, out_c, in_c, k, bias=True):
        t(key + ".weight", out_c, in_c, k, k, scale=1.0 / math.sqrt(in_c * k * k))
        if bias:
            t(key + ".bias", out_c, scale=0.05)

    def deconv(key, in_c, out_c, k):
        t(key + ".weight", in_c, out_c, k, k, scale=1.0 / math.sqrt(in_c))
        t(key + ".bias", out_c, scale=0.05)

    def ln(key, c):
        sd[key + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[key + ".bias"] = torch.randn(c, generator=g) * 0.05

    grid = cfg.img_size // 16
    t("pretrained.model.cls_token", 1, 1, C, scale=0.02)
    t("pretrained.model.pos_embed", 1, grid * grid + 1, C, scale=0.02)
    if cfg.hybrid:
        conv("pretrained.model.patch_embed.proj", C, 1024, 1)
        add_hybrid_backbone_keys(sd, seed=seed + 1)
    else:
        conv("pretrained.model.patch_embed.proj", C, 3, 16)
    for i in range(cfg.depth):
        p = f"pretrained.model.blocks.{i}"
        ln(p + ".norm1", C)
        linear(p + ".attn.qkv", 3 * C, C)
        linear(p + ".attn.proj", C, C)
        ln(p + ".norm2", C)
        linear(p + ".mlp.fc1", 4 * C, C)
        linear(p + ".mlp.fc2", C, 4 * C)

    positions = (2, 3) if cfg.hybrid else (0, 1, 2, 3)
    for pos in positions:
        app = f"pretrained.act_postprocess{pos + 1}"
        rc = cfg.reassemble_channels[pos]
        linear(app + ".0.project.0", C, 2 * C)
        conv(app + ".3", rc, C, 1)
        if pos == 0:
            deconv(app + ".4", rc, rc, 4)
        elif pos == 1:
            deconv(app + ".4", rc, rc, 2)
        elif pos == 3:
            conv(app + ".4", rc, rc, 3)

    f = cfg.features
    for i in (1, 2, 3, 4):
        conv(f"scratch.layer{i}_rn", f, cfg.reassemble_channels[i - 1], 3, bias=False)
    for rn in (1, 2, 3, 4):
        units = ("resConfUnit2",) if rn == 4 else ("resConfUnit1", "resConfUnit2")
        for u in units:
            conv(f"scratch.refinenet{rn}.{u}.conv1", f, f, 3)
            conv(f"scratch.refinenet{rn}.{u}.conv2", f, f, 3)
        conv(f"scratch.refinenet{rn}.out_conv", f, f, 1)
    conv("scratch.output_conv.0", f // 2, f, 3)
    conv("scratch.output_conv.2", 32, f // 2, 3)
    conv("scratch.output_conv.4", 1, 32, 1)
    return sd


def _ln_f(x, sd, p):
    return F.layer_norm(x, (x.shape[-1],), sd[p + ".weight"], sd[p + ".bias"], eps=1e-6)


def _attn(x, sd, p, heads):
    B, N, C = x.shape
    qkv = F.linear(x, sd[p + ".qkv.weight"], sd[p + ".qkv.bias"])
    qkv = qkv.reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
    att = att.softmax(dim=-1)
    out = (att @ v).transpose(1, 2).reshape(B, N, C)
    return F.linear(out, sd[p + ".proj.weight"], sd[p + ".proj.bias"])


def _mlp(x, sd, p):
    h = F.linear(x, sd[p + ".fc1.weight"], sd[p + ".fc1.bias"])
    h = F.gelu(h)
    return F.linear(h, sd[p + ".fc2.weight"], sd[p + ".fc2.bias"])


def _resize_pos_embed(pe, gh, gw, orig):
    if (gh, gw) == (orig, orig):
        return pe
    cls_pe, grid_pe = pe[:, :1], pe[:, 1:]
    c = grid_pe.shape[-1]
    grid = grid_pe.reshape(1, orig, orig, c).permute(0, 3, 1, 2)
    grid = F.interpolate(grid, size=(gh, gw), mode="bilinear", align_corners=False)
    grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, c)
    return torch.cat([cls_pe, grid], dim=1)


def _vit(sd, x, cfg: DPTConfig):
    B = x.shape[0]
    patches = F.conv2d(x, sd["pretrained.model.patch_embed.proj.weight"],
                       sd["pretrained.model.patch_embed.proj.bias"], stride=16)
    B, C, gh, gw = patches.shape
    tokens = patches.flatten(2).transpose(1, 2)  # (B, N, C)
    cls_tok = sd["pretrained.model.cls_token"].expand(B, -1, -1)
    tokens = torch.cat([cls_tok, tokens], dim=1)
    tokens = tokens + _resize_pos_embed(sd["pretrained.model.pos_embed"], gh, gw, cfg.img_size // 16)
    hooked = {}
    for i in range(cfg.depth):
        p = f"pretrained.model.blocks.{i}"
        tokens = tokens + _attn(_ln_f(tokens, sd, p + ".norm1"), sd, p + ".attn", cfg.num_heads)
        tokens = tokens + _mlp(_ln_f(tokens, sd, p + ".norm2"), sd, p + ".mlp")
        if i in cfg.hooks:
            hooked[i] = tokens
    return [hooked[i] for i in cfg.hooks], (gh, gw)


def _readout_reassemble(sd, tokens, pos, gh, gw, cfg):
    app = f"pretrained.act_postprocess{pos + 1}"
    cls_tok, feat = tokens[:, :1], tokens[:, 1:]
    cat = torch.cat([feat, cls_tok.expand_as(feat)], dim=-1)
    proj = F.gelu(F.linear(cat, sd[app + ".0.project.0.weight"], sd[app + ".0.project.0.bias"]))
    B, N, C = proj.shape
    fm = proj.transpose(1, 2).reshape(B, C, gh, gw)
    fm = F.conv2d(fm, sd[app + ".3.weight"], sd[app + ".3.bias"])
    if pos == 0:
        fm = F.conv_transpose2d(fm, sd[app + ".4.weight"], sd[app + ".4.bias"], stride=4)
    elif pos == 1:
        fm = F.conv_transpose2d(fm, sd[app + ".4.weight"], sd[app + ".4.bias"], stride=2)
    elif pos == 3:
        fm = F.conv2d(fm, sd[app + ".4.weight"], sd[app + ".4.bias"], stride=2, padding=1)
    return fm


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


def forward(sd, x_nchw, cfg: DPTConfig):
    with torch.no_grad():
        hooked, (gh, gw) = _vit(sd, x_nchw, cfg)
        layers = [_readout_reassemble(sd, t, pos, gh, gw, cfg) for pos, t in enumerate(hooked)]
        rn = [
            F.conv2d(layers[i], sd[f"scratch.layer{i+1}_rn.weight"], padding=1)
            for i in range(4)
        ]
        p4 = _ffb(sd, "scratch.refinenet4", rn[3])
        p3 = _ffb(sd, "scratch.refinenet3", p4, rn[2])
        p2 = _ffb(sd, "scratch.refinenet2", p3, rn[1])
        p1 = _ffb(sd, "scratch.refinenet1", p2, rn[0])
        h = F.conv2d(p1, sd["scratch.output_conv.0.weight"], sd["scratch.output_conv.0.bias"], padding=1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
        h = F.conv2d(h, sd["scratch.output_conv.2.weight"], sd["scratch.output_conv.2.bias"], padding=1)
        h = F.relu(h)
        h = F.conv2d(h, sd["scratch.output_conv.4.weight"], sd["scratch.output_conv.4.bias"])
        h = F.relu(h)
        return h[:, 0]


# -- Hybrid (R50+ViT-B) additions --------------------------------------------

def add_hybrid_backbone_keys(sd, seed=1):
    g = torch.Generator().manual_seed(seed)
    bb = "pretrained.model.patch_embed.backbone"

    def conv(key, out_c, in_c, k):
        sd[key + ".weight"] = torch.randn(out_c, in_c, k, k, generator=g) / math.sqrt(in_c * k * k)

    def gn(key, c):
        sd[key + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[key + ".bias"] = torch.randn(c, generator=g) * 0.05

    conv(bb + ".stem.conv", 64, 3, 7)
    gn(bb + ".stem.norm", 64)
    in_c = 64
    for si, (nblocks, out_c) in enumerate(zip((3, 4, 9), (256, 512, 1024))):
        for bi in range(nblocks):
            bp = f"{bb}.stages.{si}.blocks.{bi}"
            mid = out_c // 4
            conv(bp + ".conv1", mid, in_c, 1)
            gn(bp + ".norm1", mid)
            conv(bp + ".conv2", mid, mid, 3)
            gn(bp + ".norm2", mid)
            conv(bp + ".conv3", out_c, mid, 1)
            gn(bp + ".norm3", out_c)
            if bi == 0:
                conv(bp + ".downsample.conv", out_c, in_c, 1)
                gn(bp + ".downsample.norm", out_c)
            in_c = out_c
    return sd


def _std_conv_same(x, w, stride=1, eps=1e-6):
    O = w.shape[0]
    flat = w.reshape(O, -1)
    mean = flat.mean(dim=1).reshape(O, 1, 1, 1)
    var = flat.var(dim=1, unbiased=False).reshape(O, 1, 1, 1)
    w = (w - mean) * torch.rsqrt(var + eps)
    ih, iw = x.shape[-2:]
    kh, kw = w.shape[-2:]
    ph = max((math.ceil(ih / stride) - 1) * stride + kh - ih, 0)
    pw = max((math.ceil(iw / stride) - 1) * stride + kw - iw, 0)
    x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return F.conv2d(x, w, stride=stride)


def _gn_act(x, sd, p, act=True):
    h = F.group_norm(x, 32, sd[p + ".weight"], sd[p + ".bias"], eps=1e-5)
    return F.relu(h) if act else h


def _resnet_stem(sd, x):
    bb = "pretrained.model.patch_embed.backbone"
    x = _std_conv_same(x, sd[bb + ".stem.conv.weight"], stride=2)
    x = _gn_act(x, sd, bb + ".stem.norm")
    # TF-SAME maxpool 3x3/2
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / 2) - 1) * 2 + 3 - ih, 0)
    pw = max((math.ceil(iw / 2) - 1) * 2 + 3 - iw, 0)
    x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2), value=float("-inf"))
    x = F.max_pool2d(x, 3, stride=2)
    outs = []
    for si, nblocks in enumerate((3, 4, 9)):
        for bi in range(nblocks):
            bp = f"{bb}.stages.{si}.blocks.{bi}"
            stride = 2 if (si > 0 and bi == 0) else 1
            if bi == 0:
                sc = _std_conv_same(x, sd[bp + ".downsample.conv.weight"], stride=stride)
                sc = _gn_act(sc, sd, bp + ".downsample.norm", act=False)
            else:
                sc = x
            h = _std_conv_same(x, sd[bp + ".conv1.weight"])
            h = _gn_act(h, sd, bp + ".norm1")
            h = _std_conv_same(h, sd[bp + ".conv2.weight"], stride=stride)
            h = _gn_act(h, sd, bp + ".norm2")
            h = _std_conv_same(h, sd[bp + ".conv3.weight"])
            h = _gn_act(h, sd, bp + ".norm3", act=False)
            x = F.relu(h + sc)
        outs.append(x)
    return outs[2], [outs[0], outs[1]]


def _vit_hybrid(sd, x, cfg: DPTConfig):
    stem_out, stage_outs = _resnet_stem(sd, x)
    patches = F.conv2d(stem_out, sd["pretrained.model.patch_embed.proj.weight"],
                       sd["pretrained.model.patch_embed.proj.bias"])
    B, C, gh, gw = patches.shape
    tokens = patches.flatten(2).transpose(1, 2)
    cls_tok = sd["pretrained.model.cls_token"].expand(B, -1, -1)
    tokens = torch.cat([cls_tok, tokens], dim=1)
    tokens = tokens + _resize_pos_embed(sd["pretrained.model.pos_embed"], gh, gw, cfg.img_size // 16)
    t_hooks = [h for h in cfg.hooks if h >= 2]
    hooked = {}
    for i in range(cfg.depth):
        p = f"pretrained.model.blocks.{i}"
        tokens = tokens + _attn(_ln_f(tokens, sd, p + ".norm1"), sd, p + ".attn", cfg.num_heads)
        tokens = tokens + _mlp(_ln_f(tokens, sd, p + ".norm2"), sd, p + ".mlp")
        if i in t_hooks:
            hooked[i] = tokens
    return stage_outs, [hooked[i] for i in t_hooks], (gh, gw)


def forward_hybrid(sd, x_nchw, cfg: DPTConfig):
    with torch.no_grad():
        stage_outs, hooked, (gh, gw) = _vit_hybrid(sd, x_nchw, cfg)
        layers = list(stage_outs)
        for idx, t in enumerate(hooked):
            layers.append(_readout_reassemble(sd, t, idx + 2, gh, gw, cfg))
        rn = [F.conv2d(layers[i], sd[f"scratch.layer{i+1}_rn.weight"], padding=1) for i in range(4)]
        p4 = _ffb(sd, "scratch.refinenet4", rn[3])
        p3 = _ffb(sd, "scratch.refinenet3", p4, rn[2])
        p2 = _ffb(sd, "scratch.refinenet2", p3, rn[1])
        p1 = _ffb(sd, "scratch.refinenet1", p2, rn[0])
        h = F.conv2d(p1, sd["scratch.output_conv.0.weight"], sd["scratch.output_conv.0.bias"], padding=1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
        h = F.conv2d(h, sd["scratch.output_conv.2.weight"], sd["scratch.output_conv.2.bias"], padding=1)
        h = F.relu(h)
        h = F.conv2d(h, sd["scratch.output_conv.4.weight"], sd["scratch.output_conv.4.bias"])
        h = F.relu(h)
        return h[:, 0]
