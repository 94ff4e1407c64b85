"""Unit tests for distance_tensor_redux — hand-computed expectations plus a
brute-force python implementation of the bpwr greedy knockout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wealy_tpu.ops.redux import distance_tensor_redux


@pytest.fixture
def dist(rng):
    return rng.random((2, 3, 4, 5)).astype(np.float32) + 0.1


def _np_bpwr(d, n=None):
    """Independent greedy best-pairs-without-replacement reference."""
    s1, s2 = d.shape
    if s2 < s1:
        d = d.T
        s1, s2 = s2, s1
    n = s1 if n is None else max(1, min(n, s1))
    used_r, used_c, vals = set(), set(), []
    for _ in range(n):
        best, bi, bj = np.inf, -1, -1
        for i in range(s1):
            if i in used_r:
                continue
            for j in range(s2):
                if j in used_c:
                    continue
                if d[i, j] < best:
                    best, bi, bj = d[i, j], i, j
        if bi < 0:
            break
        used_r.add(bi)
        used_c.add(bj)
        vals.append(best)
    return float(np.mean(vals))


class TestBasicModes:
    def test_min(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "min"))
        np.testing.assert_allclose(got, dist.min(axis=(2, 3)), rtol=1e-6)

    def test_max(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "max"))
        np.testing.assert_allclose(got, dist.max(axis=(2, 3)), rtol=1e-6)

    def test_mean(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "mean"))
        np.testing.assert_allclose(got, dist.mean(axis=(2, 3)), rtol=1e-5)

    def test_min_with_mask(self, dist, rng):
        mask = rng.random(dist.shape) > 0.5
        mask[..., 0, 0] = False  # at least one valid
        got = np.asarray(distance_tensor_redux(dist, "min", mask=mask))
        want = np.where(mask, np.inf, dist).min(axis=(2, 3))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_minmean(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "minmean"))
        np.testing.assert_allclose(got, dist.mean(axis=3).min(axis=2), rtol=1e-5)

    def test_meanmin(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "meanmin"))
        np.testing.assert_allclose(got, dist.min(axis=3).mean(axis=2), rtol=1e-5)

    def test_meanmin_mask_count_weighted(self, dist, rng):
        # With a mask, meanmin is count-weighted by valid entries per row
        # (broadcast semantics of the reference).
        mask = rng.random(dist.shape) > 0.4
        mask[..., 0] = False  # every row has all s2 valid in col 0? no: make row 0 fully valid
        got = np.asarray(distance_tensor_redux(dist, "meanmin", mask=mask))
        rowmin = np.where(mask, np.inf, dist).min(axis=3)  # (b1,b2,s1)
        cnt = (~mask).sum(axis=3)  # valid count per row
        num = (rowmin * cnt).sum(axis=2)
        den = np.maximum(cnt.sum(axis=2), 1e-7)
        np.testing.assert_allclose(got, num / den, rtol=1e-5)

    def test_best_k(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "best-3"))
        flat = dist.reshape(2, 3, -1)
        want = np.sort(flat, axis=-1)[..., :3].mean(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_worst_k(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "worst-4"))
        flat = dist.reshape(2, 3, -1)
        want = np.sort(flat, axis=-1)[..., -4:].mean(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bestmin_k(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "bestmin-2"))
        rowmin = dist.min(axis=3)
        want = np.sort(rowmin, axis=-1)[..., :2].mean(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_symmetric_mean_equals_mean(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "smean"))
        np.testing.assert_allclose(got, dist.mean(axis=(2, 3)), rtol=1e-5)

    def test_symmetric_minmean(self, dist):
        got = np.asarray(distance_tensor_redux(dist, "sminmean"))
        a = dist.mean(axis=3).min(axis=2)
        b = dist.mean(axis=2).min(axis=2)
        np.testing.assert_allclose(got, 0.5 * (a + b), rtol=1e-5)

    def test_unknown_raises(self, dist):
        with pytest.raises(NotImplementedError):
            distance_tensor_redux(dist, "zzz")


class TestBpwr:
    def test_bpwr_full(self, rng):
        d = rng.random((1, 1, 4, 6)).astype(np.float32) + 0.05
        got = float(np.asarray(distance_tensor_redux(d, "bpwr"))[0, 0])
        want = _np_bpwr(d[0, 0])
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_bpwr_n(self, rng):
        d = rng.random((2, 2, 5, 5)).astype(np.float32) + 0.05
        got = np.asarray(distance_tensor_redux(d, "bpwr-2"))
        for i in range(2):
            for j in range(2):
                np.testing.assert_allclose(got[i, j], _np_bpwr(d[i, j], 2), rtol=1e-4)

    def test_bpwr_transposes_tall(self, rng):
        d = rng.random((1, 1, 6, 3)).astype(np.float32) + 0.05
        got = float(np.asarray(distance_tensor_redux(d, "bpwr"))[0, 0])
        want = _np_bpwr(d[0, 0])  # reference also transposes
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_bpwr_with_mask(self, rng):
        d = rng.random((1, 1, 3, 4)).astype(np.float32) + 0.05
        mask = np.zeros_like(d, dtype=bool)
        mask[0, 0, 0, :] = True  # exclude entire first row
        got = float(np.asarray(distance_tensor_redux(d, "bpwr", mask=mask))[0, 0])
        dm = d[0, 0].copy()
        dm[0, :] = np.inf  # excluded row can never be selected
        # run reference on remaining rows only
        want = _np_bpwr(d[0, 0][1:, :])
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_bpwr_jit_and_key(self, rng):
        d = jnp.asarray(rng.random((2, 2, 4, 4)).astype(np.float32))
        f = jax.jit(lambda x, k: distance_tensor_redux(x, "bpwr", key=k))
        out = f(d, jax.random.PRNGKey(0))
        assert out.shape == (2, 2)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestRandMin:
    def test_randmin_picks_valid_rowmin(self, rng):
        d = rng.random((1, 1, 5, 6)).astype(np.float32)
        key = jax.random.PRNGKey(3)
        got = float(np.asarray(distance_tensor_redux(d, "randmin", key=key))[0, 0])
        rowmins = d[0, 0].min(axis=1)
        assert np.any(np.isclose(got, rowmins, rtol=1e-5))
