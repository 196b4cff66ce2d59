"""EfficientNet-Lite3 encoder (tf_efficientnet_lite3 equivalent), NHWC Flax.

The MiDaS-small backbone (reference: loaded via torch.hub at
depth_midas.py:10 → MiDaS `_make_pretrained_efficientnet_lite3`, which pulls
``tf_efficientnet_lite3`` from rwightman/gen-efficientnet-pytorch and taps
features after stages 1, 2, 4 and 6).

Lite specifics (vs plain EfficientNet): no squeeze-excite, ReLU6 activation,
fixed stem (32) and head channels, TF SAME padding, BN eps 1e-3. With
width=1.2 / depth=1.4 the stage layout is:

  stem  conv3x3 s2 → 32
  s0    DS  ×1 k3 s1        →  24   (c16 → round(19.2) = 24)
  s1    MB6 ×3 k3 s2        →  32   } tap "layer1" (stride 4)
  s2    MB6 ×3 k5 s2        →  48   } tap "layer2" (stride 8)
  s3    MB6 ×5 k3 s2        →  96
  s4    MB6 ×5 k5 s1        → 136   } tap "layer3" (stride 16)
  s5    MB6 ×6 k5 s2        → 232
  s6    MB6 ×1 k3 s1        → 384   } tap "layer4" (stride 32)

Param names mirror the timm/geffnet state-dict layout
(``conv_stem``, ``bn1``, ``blocks_{stage}_{idx}``) so weight conversion is a
pure name/layout transpose (utils/convert.py).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.models.layers import (
    DepthwiseSeparable,
    FrozenBatchNorm,
    InvertedResidual,
    relu6,
)

# (block type, repeats, kernel, stride, expand, out_channels)
LITE3_STAGES = (
    ("ds", 1, 3, 1, 1, 24),
    ("ir", 3, 3, 2, 6, 32),
    ("ir", 3, 5, 2, 6, 48),
    ("ir", 5, 3, 2, 6, 96),
    ("ir", 5, 5, 1, 6, 136),
    ("ir", 6, 5, 2, 6, 232),
    ("ir", 1, 3, 1, 6, 384),
)

# stage index (0-based) after which MiDaS taps a feature map
# (MiDaS blocks[0:2]/[2:3]/[3:5]/[5:9] grouping)
FEATURE_TAPS = {1: "layer1", 2: "layer2", 4: "layer3", 6: "layer4"}
FEATURE_CHANNELS = {"layer1": 32, "layer2": 48, "layer3": 136, "layer4": 384}


class EfficientNetLite3(nn.Module):
    """Returns the four MiDaS feature taps as a dict."""

    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, name="conv_stem")(x)
        x = FrozenBatchNorm(32, eps=self.bn_eps, name="bn1")(x)
        x = relu6(x)

        feats: Dict[str, jnp.ndarray] = {}
        for si, (btype, reps, k, s, e, c) in enumerate(LITE3_STAGES):
            for bi in range(reps):
                stride = s if bi == 0 else 1
                name = f"blocks_{si}_{bi}"
                if btype == "ds":
                    x = DepthwiseSeparable(c, kernel_size=k, strides=stride, bn_eps=self.bn_eps, name=name)(x)
                else:
                    x = InvertedResidual(c, kernel_size=k, strides=stride, expand_ratio=e, bn_eps=self.bn_eps, name=name)(x)
            if si in FEATURE_TAPS:
                feats[FEATURE_TAPS[si]] = x
        return feats
