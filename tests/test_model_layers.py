"""Tests for the model building blocks — key blocks cross-checked against the
corresponding torch modules (independent implementations of the same math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wealy_tpu.models import layers as L


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


class TestMeanPool:
    def test_unmasked(self, rng):
        x = rng.normal(size=(2, 7, 4)).astype(np.float32)
        got = np.asarray(L.mean_pool(x))
        np.testing.assert_allclose(got, x.mean(axis=1), rtol=1e-6)

    def test_masked(self, rng):
        x = rng.normal(size=(2, 7, 4)).astype(np.float32)
        mask = np.zeros((2, 7), bool)
        mask[0, :3] = True
        mask[1, :] = True
        got = np.asarray(L.mean_pool(x, mask))
        np.testing.assert_allclose(got[0], x[0, :3].mean(axis=0), rtol=1e-5)
        np.testing.assert_allclose(got[1], x[1].mean(axis=0), rtol=1e-5)


class TestConvBlock:
    def test_matches_torch(self, rng, key):
        x = rng.normal(size=(2, 10, 8)).astype(np.float32)
        block = L.ConvBlock(16, kernel_size=3, stride=2)
        params = block.init(key, x)["params"]
        got = np.asarray(block.apply(params_wrap(params), x))

        # torch reference: Conv1d(no bias) -> ReLU -> LayerNorm(channel-last)
        conv = torch.nn.Conv1d(8, 16, 3, stride=2, padding=1, bias=False)
        with torch.no_grad():
            # linen kernel (k, in, out) -> torch (out, in, k)
            conv.weight.copy_(torch.tensor(np.transpose(params["conv"]["kernel"], (2, 1, 0))))
        ln = torch.nn.LayerNorm(16)
        with torch.no_grad():
            ln.weight.copy_(torch.tensor(params["norm"]["scale"]))
            ln.bias.copy_(torch.tensor(params["norm"]["bias"]))
        xt = torch.tensor(np.swapaxes(x, 1, 2))  # (B, C, T)
        want = ln(torch.relu(conv(xt)).transpose(1, 2)).detach().numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def params_wrap(p):
    return {"params": p}


class TestInstanceNorm:
    def test_matches_torch_2d(self, rng, key):
        x = rng.normal(size=(2, 5, 6, 4)).astype(np.float32)
        mod = L.InstanceNorm(4, affine=True)
        params = mod.init(key, x)["params"]
        got = np.asarray(mod.apply({"params": params}, x))
        tn = torch.nn.InstanceNorm2d(4, affine=True)
        with torch.no_grad():
            tn.weight.copy_(torch.tensor(params["scale"]))
            tn.bias.copy_(torch.tensor(params["bias"]))
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        want = np.transpose(tn(xt).detach().numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestIBN:
    def test_train_matches_torch(self, rng, key):
        x = rng.normal(size=(4, 6, 8)).astype(np.float32)  # (B, T, C)
        mod = L.InstanceBatchNorm(8)
        variables = mod.init(key, x, train=True)
        got, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        got = np.asarray(got)

        bn = torch.nn.BatchNorm1d(4).train()
        inst = torch.nn.InstanceNorm1d(4, affine=True).train()
        xt = torch.tensor(np.swapaxes(x, 1, 2))  # (B, C, T)
        h1 = bn(xt[:, :4])
        h2 = inst(xt[:, 4:])
        want = np.swapaxes(torch.cat([h1, h2], dim=1).detach().numpy(), 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestGeM:
    def test_matches_torch_formula(self, rng, key):
        import math

        x = np.abs(rng.normal(size=(2, 5, 5, 4))).astype(np.float32)
        mod = L.GeMPool(features=1, p_init=3.0)
        params = mod.init(key, x)["params"]
        got = np.asarray(mod.apply({"params": params}, x))
        # independent numpy computation
        pinit = math.log(math.exp(2.0) - 1.0)
        p = 1.0 + math.log1p(math.exp(pinit))
        flat = x.reshape(2, -1, 4)
        want = (np.clip(flat, 1e-6, None) ** p).mean(axis=1) ** (1.0 / p)
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestPools:
    def test_autopool_shapes(self, rng, key):
        x = rng.normal(size=(2, 3, 7, 4)).astype(np.float32)
        mod = L.AutoPool(features=1)
        params = mod.init(key, x)["params"]
        out = mod.apply({"params": params}, x)
        assert out.shape == (2, 4)
        # with p_init=1, equals softmax-weighted mean over flattened dims
        flat = x.reshape(2, -1, 4)
        a = np.exp(flat) / np.exp(flat).sum(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), (flat * a).sum(axis=1), rtol=1e-4)

    def test_softpool_shapes(self, rng, key):
        x = rng.normal(size=(2, 6, 4)).astype(np.float32)
        mod = L.SoftPool(4)
        params = mod.init(key, x)["params"]
        out = mod.apply({"params": params}, x)
        assert out.shape == (2, 4)


class TestCQTPrepare:
    def test_max2d_norm(self, rng, key):
        x = rng.normal(size=(2, 8, 10, 1)).astype(np.float32)
        mod = L.CQTPrepare(noise=False)
        params = mod.init(key, x)["params"]
        got = np.asarray(mod.apply({"params": params}, x))
        h = np.clip(x, 0, None) ** 0.5
        h = h - h.min(axis=(1, 2), keepdims=True)
        h = h / (h.max(axis=(1, 2), keepdims=True) + 1e-6)
        np.testing.assert_allclose(got, h, rtol=1e-4, atol=1e-6)

    def test_noise_needs_rng(self, rng, key):
        x = np.abs(rng.normal(size=(1, 4, 4, 1))).astype(np.float32)
        mod = L.CQTPrepare(noise=True)
        params = mod.init(key, x)["params"]
        out = mod.apply({"params": params}, x, add_noise=True, rngs={"noise": key})
        assert np.isfinite(np.asarray(out)).all()


class TestSE:
    def test_gates_bounded(self, rng, key):
        x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
        mod = L.SqueezeExcitation2d(8)
        params = mod.init(key, x)["params"]
        out = np.asarray(mod.apply({"params": params}, x))
        ratio = np.abs(out) / (np.abs(x) + 1e-9)
        assert (ratio <= 1.0 + 1e-5).all()


class TestResBlocks:
    def test_resnet50_shapes(self, rng, key):
        x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
        mod = L.ResNet50BottBlock(16, 32, stride=2, ibn=True, se=True)
        variables = mod.init(key, x, train=True)
        out, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 4, 4, 32)

    def test_myibn_zero_gain_is_skip(self, rng, key):
        # gain is zero-initialized: same-shape block must start as identity
        x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
        mod = L.MyIBNResBlock(16, 16)
        variables = mod.init(key, x, train=False)
        out = mod.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5, atol=1e-6)

    def test_myibn_shape_change(self, rng, key):
        x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
        mod = L.MyIBNResBlock(16, 32, stride=2, ibn="post", se="post")
        variables = mod.init(key, x, train=True)
        out, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 4, 4, 32)
