"""Numeric ops layer: pure-jnp equivalents of the reference's lib/tensor_ops.py.

Mask convention throughout this subpackage: **True = masked-out / excluded**
(matching /root/reference/lib/tensor_ops.py:182-194). The model-layer mask
convention (True = valid, lib/layers.py:6-30) is the opposite; conversions
happen at module boundaries via :mod:`wealy_tpu.utils.masks`.
"""

from wealy_tpu.ops.masked import msum, mmean, mmin, mmax, mrand, mbest, mworst
from wealy_tpu.ops.distance import (
    pairwise_euclidean_distance_matrix,
    pairwise_distance_matrix,
)
from wealy_tpu.ops.framing import force_length, frames, get_frames
from wealy_tpu.ops.redux import distance_tensor_redux
from wealy_tpu.ops.misc import (
    tensor_quantile,
    covariance,
    roughly_equal,
    check_finite,
)

__all__ = [
    "msum",
    "mmean",
    "mmin",
    "mmax",
    "mrand",
    "mbest",
    "mworst",
    "pairwise_euclidean_distance_matrix",
    "pairwise_distance_matrix",
    "force_length",
    "frames",
    "get_frames",
    "distance_tensor_redux",
    "tensor_quantile",
    "covariance",
    "roughly_equal",
    "check_finite",
]
