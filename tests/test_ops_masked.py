"""Unit tests for masked reductions (wealy_tpu.ops.masked).

Expectations are computed independently with numpy (mask: True = excluded).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wealy_tpu.ops import masked as M


def _np_mmean(x, mask=None, axis=None, eps=1e-7):
    inc = np.ones_like(x) if mask is None else (~mask).astype(x.dtype)
    num = (inc * x).sum(axis=axis)
    den = np.maximum(inc.sum(axis=axis), eps)
    return num / den


class TestMSumMean:
    def test_msum_no_mask(self, rng):
        x = rng.normal(size=(4, 5)).astype(np.float32)
        np.testing.assert_allclose(M.msum(x), x.sum(), rtol=1e-6)

    def test_msum_mask_axis(self, rng):
        x = rng.normal(size=(4, 5)).astype(np.float32)
        mask = rng.random((4, 5)) > 0.5
        got = M.msum(x, mask=mask, axis=1)
        want = np.where(mask, 0.0, x).sum(axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_msum_keepdims_global(self, rng):
        x = rng.normal(size=(3, 4)).astype(np.float32)
        got = M.msum(x, keepdims=True)
        assert got.shape == (1, 1)

    def test_mmean_mask(self, rng):
        x = rng.normal(size=(6, 7)).astype(np.float32)
        mask = rng.random((6, 7)) > 0.3
        np.testing.assert_allclose(
            M.mmean(x, mask=mask, axis=0), _np_mmean(x, mask, axis=0), rtol=1e-5
        )

    def test_mmean_all_masked_is_zero(self):
        x = np.ones((3, 3), np.float32)
        mask = np.ones((3, 3), bool)
        got = M.mmean(x, mask=mask)
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_mmean_multiaxis(self, rng):
        x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
        mask = rng.random(x.shape) > 0.5
        got = M.mmean(x, mask=mask, axis=(-1, -2), keepdims=True)
        want = _np_mmean(x, mask, axis=(2, 3))[..., None, None]
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestMinMax:
    def test_mmin_mask(self, rng):
        x = rng.normal(size=(4, 6)).astype(np.float32)
        mask = rng.random((4, 6)) > 0.5
        mask[0] = [True, True, True, False, False, False]  # mixed row
        got = M.mmin(x, mask=mask, axis=1)
        want = np.where(mask, np.inf, x).min(axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mmax_multiaxis_keepdims(self, rng):
        x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
        mask = rng.random(x.shape) > 0.5
        got = M.mmax(x, mask=mask, axis=(-1, -2), keepdims=True)
        want = np.where(mask, -np.inf, x).max(axis=(2, 3), keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mmin_ctt_fill(self):
        x = np.arange(6, dtype=np.float32).reshape(2, 3)
        mask = np.ones((2, 3), bool)
        got = M.mmin(x, mask=mask, axis=1, ctt=1e12)
        np.testing.assert_allclose(got, [1e12, 1e12])


class TestTopK:
    def test_mbest_basic(self):
        x = np.array([[5.0, 1.0, 3.0, 2.0, 4.0]], np.float32)
        got = M.mbest(x, 2, axis=1)
        np.testing.assert_allclose(got, [(1.0 + 2.0) / 2], rtol=1e-6)

    def test_mbest_masked_short(self):
        # Only one valid entry but k=3: invalid fills (ctt) are dropped.
        x = np.array([[5.0, 1.0, 3.0]], np.float32)
        mask = np.array([[True, False, True]])
        got = M.mbest(x, 3, mask=mask, axis=1)
        np.testing.assert_allclose(got, [1.0], rtol=1e-6)

    def test_mworst_basic(self):
        x = np.array([[5.0, 1.0, 3.0, 2.0, 4.0]], np.float32)
        got = M.mworst(x, 2, axis=1)
        np.testing.assert_allclose(got, [(5.0 + 4.0) / 2], rtol=1e-6)

    def test_mworst_masked(self):
        x = np.array([[5.0, 1.0, 3.0]], np.float32)
        mask = np.array([[True, False, False]])
        got = M.mworst(x, 2, mask=mask, axis=1)
        np.testing.assert_allclose(got, [(1.0 + 3.0) / 2], rtol=1e-6)


class TestMRand:
    def test_mrand_selects_single_unmasked(self, rng):
        x = rng.normal(size=(8, 8)).astype(np.float32)
        mask = rng.random((8, 8)) > 0.4
        mask[:, 0] = False  # ensure at least one valid per row
        key = jax.random.PRNGKey(0)
        got = np.asarray(M.mrand(x, key, mask=mask, axis=1))
        # Every output must be one of the unmasked entries in its row.
        for i in range(8):
            valid = x[i][~mask[i]]
            assert np.any(np.isclose(got[i], valid, rtol=1e-5)), (i, got[i], valid)

    def test_mrand_jit(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        f = jax.jit(lambda x, k: M.mrand(x, k, axis=1))
        out = f(x, jax.random.PRNGKey(1))
        assert out.shape == (4,)


def test_all_jittable(rng):
    x = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    mask = jnp.asarray(rng.random((4, 5)) > 0.5)
    for fn in [
        lambda: jax.jit(lambda a, m: M.msum(a, m, axis=1))(x, mask),
        lambda: jax.jit(lambda a, m: M.mmean(a, m, axis=0))(x, mask),
        lambda: jax.jit(lambda a, m: M.mmin(a, m))(x, mask),
        lambda: jax.jit(lambda a, m: M.mmax(a, m, axis=(0, 1), keepdims=True))(x, mask),
        lambda: jax.jit(lambda a, m: M.mbest(a, 2, m, axis=1))(x, mask),
        lambda: jax.jit(lambda a, m: M.mworst(a, 2, m, axis=1))(x, mask),
    ]:
        fn()
