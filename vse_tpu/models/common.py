"""Shared flax building blocks for the OCR models.

TPU notes: all convs run in NHWC with bf16 compute / fp32 params so XLA can
tile them onto the MXU; BatchNorm folds into the conv at inference via
`use_running_average=True`. Channel counts are kept multiples of 8 (the
`make_divisible` rule) so the lane dimension packs cleanly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hard_swish(x):
    return x * hard_sigmoid(x)


ACTS: dict = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
    "hardswish": hard_swish,
    "hard_swish": hard_swish,
    "hsigmoid": hard_sigmoid,
    "swish": nn.swish,
    "gelu": nn.gelu,
    None: lambda x: x,
}


class ConvBNAct(nn.Module):
    """Conv2D + BatchNorm + activation; groups>1 gives depthwise."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Optional[str] = "relu"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return ACTS[self.act](x)


class SEBlock(nn.Module):
    """Squeeze-and-excitation with hard-sigmoid gate (MobileNetV3 style)."""

    features: int
    reduction: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        mid = make_divisible(self.features // self.reduction)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    """MobileNetV3 inverted residual: expand 1x1 -> depthwise -> (SE) -> project."""

    expand: int
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    use_se: bool
    act: str
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = ConvBNAct(self.expand, (1, 1), act=self.act, dtype=self.dtype)(x, train)
        y = ConvBNAct(
            self.expand,
            self.kernel,
            strides=self.strides,
            groups=self.expand,
            act=self.act,
            dtype=self.dtype,
        )(y, train)
        if self.use_se:
            y = SEBlock(self.expand, dtype=self.dtype)(y)
        y = ConvBNAct(self.features, (1, 1), act=None, dtype=self.dtype)(y, train)
        if self.strides == (1, 1) and inp == self.features:
            y = y + x
        return y
