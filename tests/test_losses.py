"""Unit tests for NTXent / Triplet / CLEWS losses.

Expectations computed with independent numpy implementations of the published
formulas; triplet distances additionally cross-checked against
torch.nn.TripletMarginLoss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wealy_tpu.losses import clews_loss, ntxent_loss, triplet_loss


@pytest.fixture
def batch(rng):
    # 8 samples: cliques [0,0,1,1,2,2,3,3], unique idx
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32)
    idx = np.arange(8, dtype=np.int32)
    z = rng.normal(size=(8, 16)).astype(np.float32)
    return labels, idx, z


def _np_ntxent(labels, idx, z, tau=0.1):
    zn = z / (np.linalg.norm(z, axis=-1, keepdims=True) + 1e-6)
    sim = zn @ zn.T
    logits = sim / tau
    B = len(z)
    logits[np.eye(B, dtype=bool)] = -1e9
    logits = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    pos = (labels[:, None] == labels[None, :]) & (idx[:, None] != idx[None, :])
    pos_sum = (e * pos).sum(1)
    all_sum = e.sum(1)
    return float(-np.mean(np.log(pos_sum / (all_sum + 1e-8) + 1e-8)))


class TestNTXent:
    def test_matches_numpy(self, batch):
        labels, idx, z = batch
        loss, logdict = ntxent_loss(labels, idx, z)
        np.testing.assert_allclose(float(loss), _np_ntxent(labels, idx, z), rtol=1e-4)
        assert set(logdict) == {"l_main", "v_zmax", "v_zmean", "v_zstd"}

    def test_single_label_stabilized(self, rng):
        labels = np.zeros(8, np.int32)
        idx = np.arange(8, dtype=np.int32)
        z = rng.normal(size=(8, 16)).astype(np.float32)
        loss, _ = ntxent_loss(labels, idx, z)
        assert np.isfinite(float(loss))

    def test_jit_and_grad(self, batch):
        labels, idx, z = batch
        g = jax.grad(lambda z: ntxent_loss(labels, idx, z)[0])(jnp.asarray(z))
        assert bool(jnp.all(jnp.isfinite(g)))


class TestTriplet:
    def test_matches_torch(self, batch):
        labels, idx, z = batch
        loss, logdict = triplet_loss(labels, idx, z)
        # reference mining: first positive (same label, diff idx), first
        # negative (diff label) per anchor — replicate in numpy
        anchors, pos_i, neg_i = [], [], []
        for i in range(len(labels)):
            p = np.where((labels == labels[i]) & (idx != idx[i]))[0]
            n = np.where(labels != labels[i])[0]
            if len(p) and len(n):
                anchors.append(i)
                pos_i.append(p[0])
                neg_i.append(n[0])
        tl = torch.nn.TripletMarginLoss(margin=0.2, p=2, eps=1e-6)
        want = float(
            tl(
                torch.tensor(z[anchors]),
                torch.tensor(z[pos_i]),
                torch.tensor(z[neg_i]),
            )
        )
        np.testing.assert_allclose(float(loss), want, rtol=1e-4)
        assert int(logdict["n_triplets"]) == len(anchors)

    def test_no_triplets_zero(self, rng):
        # every sample has a unique label: positives never exist
        labels = np.arange(6, dtype=np.int32)
        idx = np.arange(6, dtype=np.int32)
        z = rng.normal(size=(6, 8)).astype(np.float32)
        loss, logdict = triplet_loss(labels, idx, z)
        assert float(loss) == 0.0
        assert int(logdict["n_triplets"]) == 0

    def test_swap(self, batch):
        labels, idx, z = batch
        loss_swap, _ = triplet_loss(labels, idx, z, swap=True)
        loss_ns, _ = triplet_loss(labels, idx, z, swap=False)
        # swap replaces d_an with min(d_an, d_pn), which can only increase the hinge
        assert float(loss_swap) >= float(loss_ns) - 1e-6

    def test_grad_finite(self, batch):
        labels, idx, z = batch
        g = jax.grad(lambda z: triplet_loss(labels, idx, z)[0])(jnp.asarray(z))
        assert bool(jnp.all(jnp.isfinite(g)))


def _np_clews(labels, idx, z, gamma=8.0, b=1.0, uw=0.5, step=None, warmup=1000):
    zn = z / np.linalg.norm(z, axis=-1, keepdims=True)
    d = 1.0 - zn @ zn.T
    pos = (labels[:, None] == labels[None, :]) & (idx[:, None] != idx[None, :])
    neg = labels[:, None] != labels[None, :]
    w = pos.astype(np.float64)
    align_i = (d * w).sum(1) / np.maximum(w.sum(1), 1e-8)
    has_pos = pos.any(1)
    loss_align = align_i[has_pos].mean()
    e = np.exp(b - gamma * d)
    wn = neg.astype(np.float64)
    uni_i = (e * wn).sum(1) / np.maximum(wn.sum(1), 1e-8)
    loss_uni = np.log1p(uni_i).mean()
    if step is not None:
        uw = min(uw, uw * (step + 1) / warmup)
    return float(loss_align + uw * loss_uni), float(loss_align), float(loss_uni)


class TestCLEWS:
    def test_matches_numpy(self, batch):
        labels, idx, z = batch
        loss, logdict = clews_loss(labels, idx, z)
        want, want_a, want_u = _np_clews(labels, idx, z)
        np.testing.assert_allclose(float(loss), want, rtol=1e-4)
        np.testing.assert_allclose(float(logdict["l_cent"]), want_a, rtol=1e-4)
        np.testing.assert_allclose(float(logdict["l_cont"]), want_u, rtol=1e-4)

    def test_warmup(self, batch):
        labels, idx, z = batch
        loss0, ld0 = clews_loss(labels, idx, z, extra={"global_step": 0})
        loss999, ld999 = clews_loss(labels, idx, z, extra={"global_step": 999})
        lossbig, ldbig = clews_loss(labels, idx, z, extra={"global_step": 10_000})
        np.testing.assert_allclose(float(ld0["uniformity_weight"]), 0.5 / 1000, rtol=1e-5)
        np.testing.assert_allclose(float(ld999["uniformity_weight"]), 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(ldbig["uniformity_weight"]), 0.5, rtol=1e-5)
        want0, _, _ = _np_clews(labels, idx, z, step=0)
        np.testing.assert_allclose(float(loss0), want0, rtol=1e-4)

    def test_accepts_b1c(self, batch):
        labels, idx, z = batch
        loss2, _ = clews_loss(labels, idx, z)
        loss3, _ = clews_loss(labels, idx, z[:, None, :])
        np.testing.assert_allclose(float(loss2), float(loss3), rtol=1e-6)

    def test_diagnostics(self, batch):
        labels, idx, z = batch
        _, ld = clews_loss(labels, idx, z)
        assert int(ld["cnt_pos_pairs"]) == 8  # each of 8 anchors has exactly 1 positive
        assert int(ld["cnt_neg_pairs"]) == 8 * 6
        np.testing.assert_allclose(float(ld["anchors_with_pos"]), 1.0)
        # v_dpos is mean cosine distance over positive pairs
        zn = z / np.linalg.norm(z, axis=-1, keepdims=True)
        d = 1 - zn @ zn.T
        pos = (labels[:, None] == labels[None, :]) & (idx[:, None] != idx[None, :])
        np.testing.assert_allclose(float(ld["v_dpos"]), d[pos].mean(), rtol=1e-4)

    def test_jit_with_traced_step(self, batch):
        labels, idx, z = batch

        @jax.jit
        def f(z, step):
            return clews_loss(labels, idx, z, extra={"global_step": step})[0]

        l0 = f(jnp.asarray(z), jnp.int32(0))
        l1 = f(jnp.asarray(z), jnp.int32(5000))
        assert float(l0) < float(l1)  # warmup weight grows

    def test_grad_finite(self, batch):
        labels, idx, z = batch
        g = jax.grad(lambda z: clews_loss(labels, idx, z)[0])(jnp.asarray(z))
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_batch_too_small_raises(self, rng):
        z = rng.normal(size=(3, 8)).astype(np.float32)
        with pytest.raises(AssertionError):
            clews_loss(np.array([0, 0, 1]), np.array([0, 1, 2]), z)
