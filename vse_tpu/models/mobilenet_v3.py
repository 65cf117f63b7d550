"""MobileNetV3 backbones for text detection and recognition.

The reference's det models are PP-OCR DB with a MobileNetV3-large(x0.5)
backbone for the *_fast variants (reference backend/tools/paddle_model_config.py:50-82
resolves det model dirs; the graphs under backend/models/V3/ch_det_fast are
that architecture). We implement the standard MobileNetV3 recipe natively in
flax with two usage modes:

- det: strides over both H and W; returns pyramid features at /4 /8 /16 /32.
- rec: after the stem, strides pool H aggressively but keep W (strides (2,1))
  so the horizontal axis survives as the CTC sequence axis.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vse_tpu.models.common import ConvBNAct, InvertedResidual, make_divisible

# (kernel, expand, out, use_se, act, stride)
LARGE_CFG = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
]

SMALL_CFG = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hardswish", 2),
    (5, 240, 40, True, "hardswish", 1),
    (5, 240, 40, True, "hardswish", 1),
    (5, 120, 48, True, "hardswish", 1),
    (5, 144, 48, True, "hardswish", 1),
    (5, 288, 96, True, "hardswish", 2),
    (5, 576, 96, True, "hardswish", 1),
    (5, 576, 96, True, "hardswish", 1),
]


class MobileNetV3Det(nn.Module):
    """Detection backbone: returns 4 pyramid levels (/4, /8, /16, /32)."""

    arch: str = "large"
    scale: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = LARGE_CFG if self.arch == "large" else SMALL_CFG
        s = self.scale
        x = ConvBNAct(
            make_divisible(16 * s), (3, 3), strides=(2, 2), act="hardswish",
            dtype=self.dtype,
        )(x, train)
        feats = []
        for k, exp, out, use_se, act, stride in cfg:
            if stride == 2:
                feats.append(x)  # capture the level just before downsampling
            x = InvertedResidual(
                expand=make_divisible(exp * s),
                features=make_divisible(out * s),
                kernel=(k, k),
                strides=(stride, stride),
                use_se=use_se,
                act=act,
                dtype=self.dtype,
            )(x, train)
        # final 1x1 expansion conv (stays at /32)
        last = make_divisible((960 if self.arch == "large" else 576) * s)
        x = ConvBNAct(last, (1, 1), act="hardswish", dtype=self.dtype)(x, train)
        feats.append(x)
        # feats captured at strides 2,4,8,16 before downsample + final /32;
        # drop the stride-2 capture -> (/4, /8, /16, /32)
        return feats[1:]


class MobileNetV3Rec(nn.Module):
    """Recognition backbone: pools H to 1, keeps W/4 as the sequence axis.

    Input  [B, 48, W, C] -> output [B, W//4, C_out] after the H axis is
    mean-pooled away (PP-OCR pools with a final max-pool to H=1; we fold the
    residual H via mean which is equivalent under static shapes).
    """

    arch: str = "small"
    scale: float = 0.5
    dtype: Any = jnp.bfloat16
    last_conv_stride: Tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        cfg = LARGE_CFG if self.arch == "large" else SMALL_CFG
        s = self.scale
        x = ConvBNAct(
            make_divisible(16 * s), (3, 3), strides=(2, 2), act="hardswish",
            dtype=self.dtype,
        )(x, train)
        downsamples_seen = 0
        for k, exp, out, use_se, act, stride in cfg:
            # The first stride-2 block downsamples both axes (giving W/4 total
            # with the stem); later ones downsample H only so the W axis
            # survives as the CTC sequence.
            if stride == 2:
                strides = (2, 2) if downsamples_seen == 0 else (2, 1)
                downsamples_seen += 1
            else:
                strides = (1, 1)
            x = InvertedResidual(
                expand=make_divisible(exp * s),
                features=make_divisible(out * s),
                kernel=(k, k),
                strides=strides,
                use_se=use_se,
                act=act,
                dtype=self.dtype,
            )(x, train)
        last = make_divisible((960 if self.arch == "large" else 576) * s)
        x = ConvBNAct(last, (1, 1), act="hardswish", dtype=self.dtype)(x, train)
        # pool remaining H to 1 -> sequence [B, W', C]
        x = jnp.max(x, axis=1)
        return x
