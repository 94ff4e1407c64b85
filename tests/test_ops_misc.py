"""Unit tests for tensor_quantile / covariance / roughly_equal / check_finite."""

import jax
import jax.numpy as jnp
import numpy as np

from wealy_tpu.ops import misc as M


class TestQuantile:
    def test_median_odd(self):
        x = np.array([[3.0, 1.0, 2.0, 5.0, 4.0]], np.float32)
        q = np.array([[0.5]], np.float32)
        got = np.asarray(M.tensor_quantile(x, q, axis=-1))
        np.testing.assert_allclose(got, [3.0])

    def test_extremes(self):
        x = np.array([[3.0, 1.0, 2.0, 5.0, 4.0]], np.float32)
        lo = np.asarray(M.tensor_quantile(x, np.array([[0.0]], np.float32)))
        hi = np.asarray(M.tensor_quantile(x, np.array([[1.0]], np.float32)))
        np.testing.assert_allclose(lo, [1.0])
        np.testing.assert_allclose(hi, [5.0])

    def test_keepdims(self):
        x = np.random.default_rng(0).random((4, 9)).astype(np.float32)
        q = np.full((4, 1), 0.25, np.float32)
        got = M.tensor_quantile(x, q, axis=-1, keepdims=True)
        assert got.shape == (4, 1)

    def test_nearest_rank_rounding(self):
        # q=0.5 over 4 elements -> index round(1.5) = 2 (banker's? jnp.round
        # rounds half to even: round(1.5)=2). sorted[2] is the answer.
        x = np.array([[10.0, 20.0, 30.0, 40.0]], np.float32)
        got = np.asarray(M.tensor_quantile(x, np.array([[0.5]], np.float32)))
        np.testing.assert_allclose(got, [30.0])


class TestCovariance:
    def test_decorrelated_near_zero(self, rng):
        x = rng.normal(size=(10000, 4)).astype(np.float32)
        got = float(M.covariance(x))
        assert got < 1e-2

    def test_correlated_positive(self, rng):
        a = rng.normal(size=(200, 1)).astype(np.float32)
        x = np.concatenate([a, a, a], axis=1)
        got = float(M.covariance(x))
        # all pairwise covs equal var(a); mean of squared off-diag ~ var^2
        var = a.var(ddof=1)
        np.testing.assert_allclose(got, var**2, rtol=1e-2)

    def test_hand_computed(self):
        x = np.array([[1.0, 2.0], [3.0, 6.0], [5.0, 10.0]], np.float32)
        xx = x - x.mean(0)
        cov = xx.T @ xx / 2
        want = cov[0, 1] ** 2 / (1 + 1e-6)
        np.testing.assert_allclose(float(M.covariance(x)), want, rtol=1e-5)


def test_roughly_equal():
    assert bool(M.roughly_equal(jnp.float32(1.0), jnp.float32(1.0 + 1e-7)))
    assert not bool(M.roughly_equal(jnp.float32(1.0), jnp.float32(1.1)))


def test_check_finite():
    ok, _ = M.check_finite(jnp.ones((3,)))
    bad, _ = M.check_finite(jnp.array([1.0, jnp.nan]))
    assert bool(ok) and not bool(bad)
    # jit-safe
    f = jax.jit(lambda x: M.check_finite(x)[0])
    assert not bool(f(jnp.array([jnp.inf])))
