"""PP-OCRv3-compatible mobile DB detector + weight loader.

The reference snapshot ships ONE real weights file — the V3 mobile det
(reference backend/models/V3/ch_det_fast/inference.pdiparams); everything
else is LFS-stripped. This module reimplements that exact architecture in
flax (NHWC, bf16-ready) so the tensors extracted by tools/convert_paddle.py
load directly, giving the framework a production-quality text detector
without training:

  backbone: MobileNetV3-large x0.5, SE disabled, stem 8ch
            stages -> features at /4(16ch) /8(24ch) /16(56ch) /32(480ch)
  neck:     RSEFPN(96): per-level 1x1 residual-SE laterals, nearest-up
            top-down adds, 3x3 residual-SE smoothing to 24ch, concat at /4
  head:     DB binarize branch: 3x3 conv-bn-relu 24ch, two 2x2 stride-2
            transposed convs (24ch, then 1ch), sigmoid

Shapes verified against the converted checkpoint (288 tensors) in
tests/test_ppocr_det.py. Convs use paddle's symmetric (k//2) padding — on
stride-2 layers this differs from XLA "SAME" by one pixel, which matters for
weight parity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vse_tpu.models.common import hard_swish

ACT = {"relu": nn.relu, "hardswish": hard_swish, None: lambda x: x}


def _pad(k: int):
    p = k // 2
    return [(p, p), (p, p)]


class ConvBN(nn.Module):
    out: int
    k: int
    s: int = 1
    groups: int = 1
    act: str = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out, (self.k, self.k), strides=(self.s, self.s),
            padding=_pad(self.k), feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype,
            param_dtype=jnp.float32, name="bn",
        )(x)
        return ACT[self.act](x)


class ResidualUnit(nn.Module):
    exp: int
    out: int
    k: int
    s: int
    act: str
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        y = ConvBN(self.exp, 1, 1, act=self.act, dtype=self.dtype,
                   name="expand_conv")(x)
        y = ConvBN(self.exp, self.k, self.s, groups=self.exp, act=self.act,
                   dtype=self.dtype, name="bottleneck_conv")(y)
        y = ConvBN(self.out, 1, 1, act=None, dtype=self.dtype,
                   name="linear_conv")(y)
        if self.s == 1 and inp == self.out:
            y = x + y
        return y


# (kernel, expand, out, stride, act) per stage — MobileNetV3-large x0.5,
# make_divisible(8), SE disabled; channels verified against the checkpoint.
STAGES = [
    [(3, 8, 8, 1, "relu"), (3, 32, 16, 2, "relu"), (3, 40, 16, 1, "relu")],
    [(5, 40, 24, 2, "relu"), (5, 64, 24, 1, "relu"), (5, 64, 24, 1, "relu")],
    [(3, 120, 40, 2, "hardswish"), (3, 104, 40, 1, "hardswish"),
     (3, 96, 40, 1, "hardswish"), (3, 96, 40, 1, "hardswish"),
     (3, 240, 56, 1, "hardswish"), (3, 336, 56, 1, "hardswish")],
    [(5, 336, 80, 2, "hardswish"), (5, 480, 80, 1, "hardswish"),
     (5, 480, 80, 1, "hardswish")],
]


class PPOCRDetBackbone(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = ConvBN(8, 3, 2, act="hardswish", dtype=self.dtype, name="conv")(x)
        feats = []
        for si, blocks in enumerate(STAGES):
            for bi, (k, exp, out, s, act) in enumerate(blocks):
                x = ResidualUnit(exp, out, k, s, act, dtype=self.dtype,
                                 name=f"stage{si}_{bi}")(x)
            if si == 3:
                # final 1x1 expansion lives inside stage3 (index 3)
                x = ConvBN(480, 1, 1, act="hardswish", dtype=self.dtype,
                           name="stage3_3")(x)
            feats.append(x)
        return feats


class SEBlockP(nn.Module):
    """Paddle-style SE: conv1(+bias) relu, conv2(+bias) hardsigmoid, scale."""

    ch: int
    r: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.ch // self.r, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.ch, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(s)
        # PaddleOCR SEModule: hardsigmoid with slope=0.2, offset=0.5
        s = jnp.clip(0.2 * s + 0.5, 0.0, 1.0)
        return x * s


class RSELayer(nn.Module):
    out: int
    k: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.out, (self.k, self.k), padding=_pad(self.k), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="in_conv",
        )(x)
        return y + SEBlockP(self.out, dtype=self.dtype, name="se_block")(y)


def _up2(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, h * 2, w * 2, c)


class RSEFPN(nn.Module):
    out_channels: int = 96
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        c = self.out_channels
        lat = [
            RSELayer(c, 1, dtype=self.dtype, name=f"ins_conv_{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(lat) - 2, -1, -1):
            lat[i] = lat[i] + _up2(lat[i + 1])
        outs = []
        for i, f in enumerate(lat):
            p = RSELayer(c // 4, 3, dtype=self.dtype, name=f"inp_conv_{i}")(f)
            for _ in range(i):
                p = _up2(p)
            outs.append(p)
        # concat deepest-first [p5, p4, p3, p2] — the order the head's conv1
        # weights were trained against
        return jnp.concatenate(outs[::-1], axis=-1)


class DBHeadP(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(24, (3, 3), padding=_pad(3), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv_bn1")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(24, (2, 2), strides=(2, 2), padding="VALID",
                             use_bias=True, dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv_bn2")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), padding="VALID",
                             use_bias=True, dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv3")(x)
        return nn.sigmoid(x.astype(jnp.float32))


class PPOCRv3DetMobile(nn.Module):
    """Exact-arch PP-OCRv3 mobile DB detector (prob map only)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = images.astype(self.dtype)
        feats = PPOCRDetBackbone(dtype=self.dtype, name="backbone")(x)
        fused = RSEFPN(96, dtype=self.dtype, name="neck")(feats)
        prob = DBHeadP(dtype=self.dtype, name="head")(fused)
        return prob[..., 0]


# --- weight loading ----------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """paddle OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dwconv_w(w: np.ndarray) -> np.ndarray:
    """paddle depthwise (O,1,H,W) -> flax HWIO with feature_group_count=O:
    flax expects (H, W, in/groups=1, out=O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _tconv_w(w: np.ndarray) -> np.ndarray:
    """paddle conv2d_transpose (I,O,H,W) -> flax ConvTranspose (H,W,I,O).

    flax's ConvTranspose (transpose_kernel=False) is a fractionally-strided
    *correlation*, while paddle/torch transposed convolution scatters the
    kernel un-flipped — equivalently a correlation with the spatially
    flipped kernel. Without the flip every 2x2 upsample block comes out
    180-degree rotated (verified numerically vs torch.nn.ConvTranspose2d)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _bn(weights: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "scale": weights[prefix + ".weight"],
        "bias": weights[prefix + ".bias"],
    }, {
        "mean": weights[prefix + ".weight"] * 0 + weights[prefix + "._mean"],
        "var": weights[prefix + "._variance"],
    }


def load_ppocr_det_weights(weights: Dict[str, np.ndarray]):
    """Converted-npz dict -> flax variables for PPOCRv3DetMobile."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def convbn(dst_path, src_prefix, depthwise=False):
        w = weights[src_prefix + ".conv.weight"]
        put(params, dst_path + ["conv", "kernel"],
            _dwconv_w(w) if depthwise else _conv_w(w))
        bn_p, bn_s = _bn(weights, src_prefix + ".bn")
        put(params, dst_path + ["bn"], bn_p)
        put(batch_stats, dst_path + ["bn"], bn_s)

    # backbone
    convbn(["backbone", "conv"], "backbone.conv")
    for si, blocks in enumerate(STAGES):
        for bi in range(len(blocks)):
            base = f"backbone.stage{si}.{bi}"
            dst = ["backbone", f"stage{si}_{bi}"]
            convbn(dst + ["expand_conv"], base + ".expand_conv")
            convbn(dst + ["bottleneck_conv"], base + ".bottleneck_conv",
                   depthwise=True)
            convbn(dst + ["linear_conv"], base + ".linear_conv")
    convbn(["backbone", "stage3_3"], "backbone.stage3.3".replace(".3", ".3", 1))
    # ^ stage3.3 is the bare ConvBN at backbone.stage3.3
    # fix the path: weights keys are backbone.stage3.3.conv/bn directly
    # (handled above because convbn appends .conv/.bn)

    # neck
    for i in range(4):
        for kind in ("ins_conv", "inp_conv"):
            base = f"neck.{kind}.{i}"
            dst = ["neck", f"{kind}_{i}"]
            put(params, dst + ["in_conv", "kernel"],
                _conv_w(weights[base + ".in_conv.weight"]))
            put(params, dst + ["se_block", "conv1", "kernel"],
                _conv_w(weights[base + ".se_block.conv1.weight"]))
            put(params, dst + ["se_block", "conv1", "bias"],
                weights[base + ".se_block.conv1.bias"])
            put(params, dst + ["se_block", "conv2", "kernel"],
                _conv_w(weights[base + ".se_block.conv2.weight"]))
            put(params, dst + ["se_block", "conv2", "bias"],
                weights[base + ".se_block.conv2.bias"])

    # head (binarize branch)
    put(params, ["head", "conv1", "kernel"],
        _conv_w(weights["head.binarize.conv1.weight"]))
    bn_p, bn_s = _bn(weights, "head.binarize.conv_bn1")
    put(params, ["head", "conv_bn1"], bn_p)
    put(batch_stats, ["head", "conv_bn1"], bn_s)
    put(params, ["head", "conv2", "kernel"],
        _tconv_w(weights["head.binarize.conv2.weight"]))
    put(params, ["head", "conv2", "bias"], weights["head.binarize.conv2.bias"])
    bn_p, bn_s = _bn(weights, "head.binarize.conv_bn2")
    put(params, ["head", "conv_bn2"], bn_p)
    put(batch_stats, ["head", "conv_bn2"], bn_s)
    put(params, ["head", "conv3", "kernel"],
        _tconv_w(weights["head.binarize.conv3.weight"]))
    put(params, ["head", "conv3", "bias"], weights["head.binarize.conv3.bias"])

    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(batch_stats)}
