"""Metric-learning losses with the uniform reference contract
``loss_fn(z_label, z_idx, z, extra) -> (loss, logdict)``
(reference: /root/reference/lib/losses.py:19, 90, 210).

All losses are fully vectorized (the reference's Python triplet-mining loop is
replaced by masked argmax mining) and jit-safe. Mesh-aware "global batch"
variants that all_gather embeddings across a data-parallel axis live in
:mod:`wealy_tpu.parallel.collectives`.
"""

from wealy_tpu.losses.ntxent import ntxent_loss, NTXentLoss
from wealy_tpu.losses.triplet import triplet_loss, TripletLoss
from wealy_tpu.losses.clews import clews_loss, CLEWSLoss

__all__ = [
    "ntxent_loss",
    "NTXentLoss",
    "triplet_loss",
    "TripletLoss",
    "clews_loss",
    "CLEWSLoss",
    "get_loss",
]

_REGISTRY = {
    "ntxent": NTXentLoss,
    "triplet": TripletLoss,
    "clews": CLEWSLoss,
}


def get_loss(name: str, **kwargs):
    """Build a loss callable by name (``ntxent`` | ``triplet`` | ``clews``)."""
    try:
        return _REGISTRY[name](**kwargs)
    except KeyError:
        raise KeyError(f"unknown loss {name!r}; available: {sorted(_REGISTRY)}")
