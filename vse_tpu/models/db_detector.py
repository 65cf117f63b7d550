"""DB (Differentiable Binarization) text detector in flax.

TPU-native re-implementation of the reference's detection stage — PaddleOCR's
DB algorithm (reference backend/tools/ocr.py:94 selects `det_algorithm="DB"`,
reference backend/tools/subtitle_detect.py:5-26 wraps the det-only path).
Architecture follows the published DBNet recipe (backbone -> FPN neck ->
binarization head); *mobile* (MobileNetV3-large x0.5) and *server* (ResNet)
variants mirror the reference's fast/server model split
(reference backend/tools/paddle_model_config.py:50-82).

Inference returns the probability map only; the (prob, thresh, binary) triple
exists at training time (`train_outputs=True`).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vse_tpu.models.common import ConvBNAct, make_divisible
from vse_tpu.models.mobilenet_v3 import MobileNetV3Det


def _upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor upsample (static factor) — cheap on VPU and XLA fuses
    it into the consumer add."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


class ResNetBlock(nn.Module):
    features: int
    strides: tuple = (1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = ConvBNAct(self.features, (1, 1), act="relu", dtype=self.dtype)(x, train)
        y = ConvBNAct(
            self.features, (3, 3), strides=self.strides, act="relu", dtype=self.dtype
        )(y, train)
        y = ConvBNAct(self.features * 4, (1, 1), act=None, dtype=self.dtype)(y, train)
        if self.strides != (1, 1) or inp != self.features * 4:
            x = ConvBNAct(
                self.features * 4, (1, 1), strides=self.strides, act=None,
                dtype=self.dtype,
            )(x, train)
        return nn.relu(x + y)


class ResNetDet(nn.Module):
    """ResNet-50-style backbone for the server det model."""

    depths: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        x = ConvBNAct(64, (7, 7), strides=(2, 2), act="relu", dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        features = 64
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                strides = (2, 2) if (j == 0 and i > 0) else (1, 1)
                x = ResNetBlock(features, strides=strides, dtype=self.dtype)(x, train)
            feats.append(x)
            features *= 2
        return feats  # strides /4 /8 /16 /32


class DBFPN(nn.Module):
    """DB feature-pyramid neck: lateral 1x1s, top-down adds, per-level smooth
    3x3s, concat at /4."""

    out_channels: int = 96
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        c = self.out_channels
        lat = [
            nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway
        for i in range(len(lat) - 2, -1, -1):
            lat[i] = lat[i] + _upsample(lat[i + 1], 2)
        outs = []
        for i, f in enumerate(lat):
            p = nn.Conv(c // 4, (3, 3), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"smooth_{i}")(f)
            if i > 0:
                p = _upsample(p, 2 ** i)
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)  # [B, H/4, W/4, c]


class DBHead(nn.Module):
    """Binarization head: conv3x3 -> up2 -> up2 -> sigmoid prob map."""

    in_channels: int = 96
    dtype: Any = jnp.bfloat16
    name_prefix: str = "binarize"

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        c = self.in_channels // 4
        x = ConvBNAct(c, (3, 3), act="relu", dtype=self.dtype)(x, train)
        x = nn.ConvTranspose(
            c, (2, 2), strides=(2, 2), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(
            1, (2, 2), strides=(2, 2), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))  # [B, H, W, 1] in fp32


class DBDetector(nn.Module):
    """Full DB text detector.

    variant="mobile": MobileNetV3-large x0.5 backbone, FPN 96ch (the
    reference's *_det_fast models). variant="server": ResNet-50 backbone,
    FPN 256ch (the reference's V4 ch_det server model).
    """

    variant: str = "mobile"
    dtype: Any = jnp.bfloat16
    train_outputs: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: [B, H, W, 3] normalized; H, W multiples of 32."""
        x = images.astype(self.dtype)
        if self.variant == "mobile":
            feats = MobileNetV3Det(arch="large", scale=0.5, dtype=self.dtype)(x, train)
            fpn_ch = 96
        elif self.variant == "server":
            feats = ResNetDet(dtype=self.dtype)(x, train)
            fpn_ch = 256
        else:
            raise ValueError(f"unknown det variant {self.variant}")
        fused = DBFPN(out_channels=fpn_ch, dtype=self.dtype)(feats, train)
        prob = DBHead(in_channels=fpn_ch, dtype=self.dtype, name="head_prob")(
            fused, train
        )
        if not (train or self.train_outputs):
            return prob[..., 0]  # [B, H, W]
        thresh = DBHead(in_channels=fpn_ch, dtype=self.dtype, name="head_thresh")(
            fused, train
        )
        # differentiable binarization: sigmoid(k * (P - T)), k = 50
        binary = nn.sigmoid(50.0 * (prob.astype(jnp.float32) - thresh))
        return prob[..., 0], thresh[..., 0], binary[..., 0]
