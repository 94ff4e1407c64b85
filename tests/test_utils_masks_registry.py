"""Coverage for mask converters and the loss registry."""

import numpy as np
import pytest

from wealy_tpu.losses import get_loss
from wealy_tpu.utils.masks import excluded_to_valid, valid_to_excluded


def test_mask_converters_roundtrip(rng):
    m = rng.random((4, 5)) > 0.5
    np.testing.assert_array_equal(np.asarray(valid_to_excluded(m)), ~m)
    np.testing.assert_array_equal(np.asarray(excluded_to_valid(m)), ~m)
    np.testing.assert_array_equal(
        np.asarray(excluded_to_valid(valid_to_excluded(m))), m
    )


def test_loss_registry(rng):
    labels = np.repeat(np.arange(4, dtype=np.int32), 2)
    idx = np.arange(8, dtype=np.int32)
    z = rng.normal(size=(8, 16)).astype(np.float32)
    for name in ("ntxent", "triplet", "clews"):
        loss_fn = get_loss(name)
        loss, logdict = loss_fn(labels, idx, z)
        assert np.isfinite(float(loss))
        assert "l_main" in logdict
    with pytest.raises(KeyError):
        get_loss("nope")


def test_loss_registry_kwargs(rng):
    labels = np.repeat(np.arange(4, dtype=np.int32), 2)
    idx = np.arange(8, dtype=np.int32)
    z = rng.normal(size=(8, 16)).astype(np.float32)
    l1, _ = get_loss("clews", gamma=4.0)(labels, idx, z)
    l2, _ = get_loss("clews", gamma=16.0)(labels, idx, z)
    assert float(l1) != float(l2)
