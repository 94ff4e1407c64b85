"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    Default: 1-D ``data`` axis across every device — the layout for
    data-parallel extraction/training and row-sharded similarity. Pass
    ``axis_names=("data", "model")`` with a shape for 2-D layouts.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    devices = devices.reshape(shape)
    return Mesh(devices, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim ``axis`` over the mesh's ``data`` axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
