"""Unit tests for pairwise distances — cross-checked against scipy-free numpy
references and torch.cdist (torch CPU is available in the image)."""

import numpy as np
import pytest
import torch

from wealy_tpu.ops import distance as D


@pytest.fixture
def xy(rng):
    x = rng.normal(size=(7, 16)).astype(np.float32)
    y = rng.normal(size=(9, 16)).astype(np.float32)
    return x, y


class TestEuclidean:
    def test_squared(self, xy):
        x, y = xy
        got = np.asarray(D.pairwise_euclidean_distance_matrix(x, y, squared=True))
        want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_sqrt_zero_stable(self):
        x = np.ones((3, 4), np.float32)
        d = np.asarray(D.pairwise_euclidean_distance_matrix(x, x))
        np.testing.assert_allclose(d, 0.0, atol=1e-5)


class TestPairwiseModes:
    def test_fro_matches_cdist(self, xy):
        x, y = xy
        got = np.asarray(D.pairwise_distance_matrix(x, y, mode="fro"))
        want = torch.cdist(torch.tensor(x)[None], torch.tensor(y)[None], p=2)[0].numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_fro_p1(self, xy):
        x, y = xy
        got = np.asarray(D.pairwise_distance_matrix(x, y, mode="fro", p=1))
        want = np.abs(x[:, None, :] - y[None, :, :]).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_nfro_normalization(self, xy):
        x, y = xy
        a = np.asarray(D.pairwise_distance_matrix(x, y, mode="fro"))
        b = np.asarray(D.pairwise_distance_matrix(x, y, mode="nfro"))
        np.testing.assert_allclose(b, a / np.sqrt(x.shape[-1]), rtol=1e-5)

    def test_nsqeuc(self, xy):
        x, y = xy
        got = np.asarray(D.pairwise_distance_matrix(x, y, mode="nsqeuc"))
        want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1) / x.shape[-1]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_cossim(self, xy):
        x, y = xy
        got = np.asarray(D.pairwise_distance_matrix(x, y, mode="cossim"))
        xn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
        yn = y / (np.linalg.norm(y, axis=-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(got, xn @ yn.T, rtol=1e-4, atol=1e-5)

    def test_cos_is_one_minus_cossim(self, xy):
        x, y = xy
        c = np.asarray(D.pairwise_distance_matrix(x, y, mode="cos"))
        s = np.asarray(D.pairwise_distance_matrix(x, y, mode="cossim"))
        np.testing.assert_allclose(c, 1.0 - s, rtol=1e-5, atol=1e-6)

    def test_dotsim(self, xy):
        x, y = xy
        got = np.asarray(D.pairwise_distance_matrix(x, y, mode="dotsim"))
        np.testing.assert_allclose(got, x @ y.T, rtol=1e-4, atol=1e-4)

    def test_1d_inputs(self, rng):
        x = rng.normal(size=(5,)).astype(np.float32)
        y = rng.normal(size=(6,)).astype(np.float32)
        got = np.asarray(D.pairwise_distance_matrix(x, y, mode="sqeuc"))
        want = (x[:, None] - y[None, :]) ** 2
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_unknown_mode_raises(self, xy):
        x, y = xy
        with pytest.raises(NotImplementedError):
            D.pairwise_distance_matrix(x, y, mode="nope")
