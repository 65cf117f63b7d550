"""TPU topology probe + mesh construction.

Replaces the reference's HardwareAccelerator CUDA/ONNX-EP matrix
(reference backend/tools/hardware_accelerator.py:9-93) with a JAX device
probe: the only backends are TPU and CPU, and the multi-chip story is a
`jax.sharding.Mesh` over ICI instead of per-process GPU selection.
"""

from __future__ import annotations

import os
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class Accelerator:
    """Singleton device/topology probe (mirrors the reference's
    HardwareAccelerator.instance() contract, hardware_accelerator.py:9-15)."""

    _instance: Optional["Accelerator"] = None
    _lock = threading.Lock()

    @classmethod
    def instance(cls) -> "Accelerator":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def __init__(self):
        self._devices = jax.devices()
        self._enabled = True

    # -- reference-parity surface (hardware_accelerator.py:62-93) -----------
    @property
    def devices(self):
        return self._devices if self._enabled else jax.devices("cpu")

    def has_accelerator(self) -> bool:
        return self._enabled and any(
            d.platform not in ("cpu",) for d in self._devices
        )

    def set_enabled(self, enabled: bool) -> None:
        """Global enable switch (reference hardware_accelerator.py:89-90)."""
        self._enabled = enabled

    @property
    def onnx_providers(self) -> list:
        """Reference API compat: we have no ONNX EPs; empty list."""
        return []

    # -- mesh construction ---------------------------------------------------
    def make_mesh(
        self,
        axes: Sequence[str] = ("data",),
        shape: Optional[Sequence[int]] = None,
        devices=None,
    ) -> Mesh:
        """Build a device mesh for frame-axis data parallelism (and, for
        training, extra model axes). Default: all devices on one 'data' axis —
        subtitle extraction shards the *time* (frame batch) axis across chips.
        """
        devices = list(devices if devices is not None else self.devices)
        n = len(devices)
        if shape is None:
            shape = (n,) + (1,) * (len(axes) - 1)
        if int(np.prod(shape)) != n:
            raise ValueError(f"mesh shape {shape} != #devices {n}")
        dev_array = np.array(devices).reshape(shape)
        return Mesh(dev_array, axis_names=tuple(axes))


def frame_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a [batch, H, W, C] frame stack: shard the frame axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
