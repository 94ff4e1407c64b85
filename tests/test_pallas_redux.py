"""Fused bpwr redux kernel (ops/pallas_redux.py): interpret-mode parity vs
the XLA ``distance_tensor_redux`` bpwr path it replaces, across mask
patterns, shape degeneracies, padding, and the bpwr-n variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wealy_tpu.ops.pallas_redux import _block_p, bpwr_block_redux
from wealy_tpu.ops.redux import distance_tensor_redux


def _xla_ref(d, qvalid, cvalid, redux):
    excl = (~qvalid)[:, None, :, None] | (~cvalid)[None, :, None, :]
    return distance_tensor_redux(
        jnp.asarray(d), redux, mask=jnp.broadcast_to(jnp.asarray(excl), d.shape)
    )


def _rand_case(rng, Q, B, s1, s2, mask_p=0.3):
    d = rng.uniform(0.0, 2.0, size=(Q, B, s1, s2)).astype(np.float32)
    qvalid = rng.uniform(size=(Q, s1)) > mask_p
    cvalid = rng.uniform(size=(B, s2)) > mask_p
    # ensure at least one valid chunk per set except a deliberate empty row
    qvalid[:, 0] = True
    cvalid[:, 0] = True
    return d, qvalid, cvalid


@pytest.mark.parametrize("shape", [(5, 7, 4, 6), (3, 9, 6, 4), (2, 3, 1, 5),
                                   (4, 2, 5, 1), (1, 1, 3, 3)])
@pytest.mark.parametrize("redux", ["bpwr", "bpwr-2"])
def test_interpret_matches_xla(shape, redux):
    rng = np.random.default_rng(sum(shape) + len(redux))
    d, qv, cv = _rand_case(rng, *shape)
    got = bpwr_block_redux(
        jnp.asarray(d), jnp.asarray(qv), jnp.asarray(cv), redux, interpret=True
    )
    want = _xla_ref(d, qv, cv, redux)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fully_masked_pairs_are_zero():
    """Fully-padded corpus rows (cvalid all-False) reduce to 0 — the padded
    rows of streaming_relevant_ranks blocks (excluded from ranking by the
    n_valid bookkeeping, but they must not be NaN/inf)."""
    rng = np.random.default_rng(0)
    d, qv, cv = _rand_case(rng, 4, 6, 3, 5, mask_p=0.0)
    cv[4:] = False  # two fully-padded candidate sets
    got = np.asarray(bpwr_block_redux(
        jnp.asarray(d), jnp.asarray(qv), jnp.asarray(cv), interpret=True
    ))
    want = np.asarray(_xla_ref(d, qv, cv, "bpwr"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert np.all(got[:, 4:] == 0.0)


def test_tied_minima_select_together():
    """Duplicate global minima: every tied entry is selected the round its
    value wins and all their rows/columns knock out together (the reference's
    `sel = dist <= mn` semantics) — exercised with an exactly-duplicated
    candidate chunk."""
    rng = np.random.default_rng(1)
    d, qv, cv = _rand_case(rng, 3, 4, 4, 5, mask_p=0.0)
    d[:, :, 2, 3] = d[:, :, 1, 0]  # exact cross-row/col tie
    got = bpwr_block_redux(jnp.asarray(d), jnp.asarray(qv), jnp.asarray(cv),
                           interpret=True)
    want = _xla_ref(d, qv, cv, "bpwr")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_lane_padding_roundtrip():
    """B far below the lane block: padded pairs are sliced off and real
    columns are unaffected."""
    rng = np.random.default_rng(2)
    d, qv, cv = _rand_case(rng, 2, 2, 3, 3)
    got = bpwr_block_redux(jnp.asarray(d), jnp.asarray(qv), jnp.asarray(cv),
                           interpret=True)
    assert got.shape == (2, 2)
    want = _xla_ref(d, qv, cv, "bpwr")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_oversize_tile_falls_back():
    """s1*s2 too large for the VMEM budget -> XLA fallback, same answer."""
    assert _block_p(70, 70) == 0
    rng = np.random.default_rng(3)
    d, qv, cv = _rand_case(rng, 2, 2, 70, 70)
    got = bpwr_block_redux(jnp.asarray(d), jnp.asarray(qv), jnp.asarray(cv),
                           interpret=True)
    want = _xla_ref(d, qv, cv, "bpwr")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_cpu_backend_gate_is_noop():
    """Off-TPU without interpret: bpwr_block_redux IS the XLA path."""
    rng = np.random.default_rng(4)
    d, qv, cv = _rand_case(rng, 3, 5, 4, 4)
    got = bpwr_block_redux(jnp.asarray(d), jnp.asarray(qv), jnp.asarray(cv))
    want = _xla_ref(d, qv, cv, "bpwr")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
