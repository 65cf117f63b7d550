"""Sharding rules: how the OCR models and frame streams lay out on a mesh.

The reference's "parallelism" is process pipelining on one host (SURVEY.md
§2.2); there is nothing to translate. The TPU-native layout (SURVEY.md P1-P5
equivalents):

- inference: the frame/time axis is the data axis — frame batches shard over
  `data` (ICI all-gather-free; each chip OCRs its own frames); params
  replicate.
- training: dp over the batch axis + tp over the widest matmul outputs (CTC
  projection vocab axis, LSTM hidden, FPN/head channels) via GSPMD — we
  annotate `NamedSharding`s and let XLA insert the collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 0, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices) // n_model
    dev = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] arrays: shard the leading (frame/batch) axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- parameter partitioning (tensor parallel) -------------------------------

def _spec_for(path: str, value: Any) -> P:
    """Model-parallel rules keyed on param path + shape.

    - `ctc_fc` kernel/bias: shard the vocab (output) axis -> P(..., 'model')
      (the vocab axis is the widest dim for CJK heads: 6k+ classes).
    - LSTM input/hidden kernels: shard the stacked-gate output axis.
    - conv kernels with >=256 output channels: shard the output-channel axis.
    - everything else: replicate.
    """
    ndim = getattr(value, "ndim", 0)
    if ndim == 0:
        return P()
    if "ctc_fc" in path:
        if ndim == 2:
            return P(None, "model")
        if ndim == 1:
            return P("model")
    if "lstm" in path and "kernel" in path.split("/")[-1] and ndim == 2:
        return P(None, "model")
    if path.endswith("kernel") and ndim == 4 and value.shape[-1] >= 256:
        return P(None, None, None, "model")
    return P()


def _flatten_paths(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_paths(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        yield prefix, tree


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings matching `params`."""

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: build(v, f"{prefix}/{k}" if prefix else str(k))
                for k, v in tree.items()
            }
        spec = _spec_for(prefix, tree)
        # guard: axis size must divide the dim; else replicate
        try:
            for ax, name in enumerate(spec):
                if name is not None:
                    if tree.shape[ax] % mesh.shape[name] != 0:
                        return NamedSharding(mesh, P())
        except (AttributeError, IndexError):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return build(params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place params on the mesh per the TP rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings,
        is_leaf=lambda x: not isinstance(x, dict),
    )
