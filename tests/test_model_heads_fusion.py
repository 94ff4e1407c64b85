"""Tests for projection heads, fusion models, CLEWS encoder, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wealy_tpu.models.clews_encoder import ClewsEncoder, ClewsWindowEncoder
from wealy_tpu.models.heads import ProjectionHead, SequenceProjectionHead
from wealy_tpu.models.registry import MODEL_NAMES, build_model


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


class TestProjectionHead:
    def test_shapes_and_mask(self, rng, key):
        x = rng.normal(size=(3, 20, 64)).astype(np.float32)
        mask = np.ones((3, 20), bool)
        mask[0, 10:] = False
        head = ProjectionHead(zdim=32, hidden=(32, 32), strides=(2, 1))
        params = head.init(key, x, mask)["params"]
        z = head.apply({"params": params}, x, mask)
        assert z.shape == (3, 32)

    def test_l2_normalize(self, rng, key):
        x = rng.normal(size=(2, 10, 16)).astype(np.float32)
        head = ProjectionHead(zdim=8, hidden=(16,), l2_normalize=True)
        params = head.init(key, x)["params"]
        z = np.asarray(head.apply({"params": params}, x))
        np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, rtol=1e-5)

    def test_masked_pool_ignores_padding(self, rng, key):
        # padding beyond the conv receptive field of the valid frames must not
        # affect the pooled output: valid frames are [0, 6), kernel 3 reaches
        # frame 6, so perturb only frames >= 7.
        x1 = rng.normal(size=(1, 12, 16)).astype(np.float32)
        x2 = x1.copy()
        x2[0, 7:] = 99.0
        mask = np.zeros((1, 12), bool)
        mask[0, :6] = True
        head = ProjectionHead(zdim=8, hidden=(16,))
        params = head.init(key, x1, mask)["params"]
        z1 = np.asarray(head.apply({"params": params}, x1, mask))
        z2 = np.asarray(head.apply({"params": params}, x2, mask))
        np.testing.assert_allclose(z1, z2, rtol=1e-5, atol=1e-6)

    def test_sequence_head(self, rng, key):
        x = rng.normal(size=(2, 20, 32)).astype(np.float32)
        mask = np.ones((2, 20), bool)
        head = SequenceProjectionHead(zdim=16, hidden=(32,), strides=(2,))
        params = head.init(key, x, mask)["params"]
        z, m = head.apply({"params": params}, x, mask)
        assert z.shape == (2, 10, 16) and m.shape == (2, 10)


class TestFusionModels:
    def _inputs(self, rng):
        wseq = rng.normal(size=(4, 15, 64)).astype(np.float32)
        wmask = np.ones((4, 15), bool)
        cseq = rng.normal(size=(4, 8, 32)).astype(np.float32)
        cmask = np.ones((4, 8), bool)
        return wseq, wmask, cseq, cmask

    @pytest.mark.parametrize(
        "name",
        [
            "multimodal-cross-attention",
            "multimodal-concatenation",
            "multimodal-cross-attention-residual",
        ],
    )
    def test_dual_models(self, rng, key, name):
        """These names train on the reference's WEALY 5-item format: one
        (C,) WEALY chunk embedding per version + CLEWS context (sig
        "wealy"; the vector enters the sequence-fusion module as a
        length-1 query via WealyQueryFusion)."""
        wseq, wmask, cseq, cmask = self._inputs(rng)
        wvec = wseq[:, 0, :]  # (B, C) WEALY chunk embedding
        model, sig = build_model(name, zdim=32)
        assert sig == "wealy"
        params = model.init(key, wvec, cseq, cmask)["params"]
        z = model.apply({"params": params}, wvec, cseq, cmask)
        assert z.shape == (4, 32)
        assert np.isfinite(np.asarray(z)).all()

    @pytest.mark.parametrize("name", ["whisper-clews", "multimodal-two-stream"])
    def test_two_stream(self, rng, key, name):
        wseq, wmask, cseq, cmask = self._inputs(rng)
        model, sig = build_model(name, zdim=32)
        assert sig == "two_stream"
        params = model.init(key, wseq, wmask, cseq, cmask)["params"]
        z, zw, zc = model.apply({"params": params}, wseq, wmask, cseq, cmask)
        assert z.shape == zw.shape == zc.shape == (4, 32)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0, rtol=1e-5)

    def test_wealy_clews(self, rng, key):
        wvec = rng.normal(size=(4, 512)).astype(np.float32)
        cseq = rng.normal(size=(4, 116, 2048)).astype(np.float32) * 0.01
        cmask = np.ones((4, 116), bool)
        model, sig = build_model("wealy-clews", zdim=64)
        assert sig == "wealy"
        params = model.init(key, wvec, cseq, cmask)["params"]
        z = model.apply({"params": params}, wvec, cseq, cmask)
        assert z.shape == (4, 64)

    def test_whisper_single(self, rng, key):
        x = rng.normal(size=(4, 20, 1280)).astype(np.float32)
        model, sig = build_model("whisper", zdim=512)
        assert sig == "single"
        params = model.init(key, x)["params"]
        z = model.apply({"params": params}, x)
        assert z.shape == (4, 512)

    def test_registry_complete(self):
        for name in MODEL_NAMES:
            model, sig = build_model(name)
            assert model is not None and sig in ("single", "wealy", "dual", "two_stream")
        with pytest.raises(KeyError):
            build_model("bogus")


class TestClewsEncoder:
    def test_encoder_shape(self, rng, key):
        cqt = np.abs(rng.normal(size=(2, 72, 64, 1))).astype(np.float32)
        enc = ClewsEncoder(embed_dim=128, stem=8, stages=((8, 1), (16, 2)), blocks_per_stage=1)
        variables = enc.init(key, cqt, train=False)
        z = enc.apply(variables, cqt, train=False)
        assert z.shape == (2, 128)
        assert np.isfinite(np.asarray(z)).all()

    def test_window_encoder_shape(self, rng, key):
        cqt = np.abs(rng.normal(size=(1, 36, 32, 1))).astype(np.float32)
        enc = ClewsWindowEncoder(
            n_windows=4,
            embed_dim=64,
            encoder_kwargs=dict(stem=8, stages=((8, 2),), blocks_per_stage=1),
        )
        variables = enc.init(key, cqt, train=False)
        z = enc.apply(variables, cqt, train=False)
        assert z.shape == (1, 4, 64)
