"""Direct runtime parity against the reference implementation itself.

These tests import the reference library from the read-only mount
(/root/reference) and compare its torch outputs with wealy_tpu's jnp outputs
on identical random inputs — the strongest possible parity evidence for the
behavior-dense numeric layer. No reference code is copied; it is only
executed. Skipped wholesale when the mount is absent.

(lib/losses.py is excluded: it imports pytorch_metric_learning, which is not
installed in this image — its formulas are covered by the independent numpy
oracles in tests/test_losses.py.)
"""

import sys

import numpy as np
import pytest

from _ref_import import import_ref, ref_exists

tops = None
ref_layers = None
torch = None
if ref_exists("tensor_ops.py"):
    try:
        import torch  # noqa: F401

        tops = import_ref("tensor_ops")
        ref_layers = import_ref("layers")
    except Exception:  # pragma: no cover - optional dependency gaps
        tops = None

pytestmark = pytest.mark.skipif(tops is None, reason="reference lib not importable")

import wealy_tpu.ops as W  # noqa: E402
from wealy_tpu.models import layers as WL  # noqa: E402


def _t(x):
    return torch.tensor(np.asarray(x))


class TestMaskedReductionParity:
    def _xm(self, rng, shape=(3, 5, 7)):
        x = rng.normal(size=shape).astype(np.float32)
        mask = rng.random(shape) > 0.4
        return x, mask

    def test_msum(self, rng):
        x, m = self._xm(rng)
        np.testing.assert_allclose(
            np.asarray(W.msum(x, m, axis=1)),
            tops.msum(_t(x), _t(m), dim=1).numpy(),
            rtol=1e-5, atol=1e-6,
        )

    def test_mmean_multiaxis(self, rng):
        x, m = self._xm(rng)
        np.testing.assert_allclose(
            np.asarray(W.mmean(x, m, axis=(-1, -2), keepdims=True)),
            tops.mmean(_t(x), _t(m), dim=(-1, -2), keepdim=True).numpy(),
            rtol=1e-5, atol=1e-6,
        )

    def test_mmin_mmax(self, rng):
        x, m = self._xm(rng)
        m[..., 0] = False  # keep at least one valid everywhere
        np.testing.assert_allclose(
            np.asarray(W.mmin(x, m, axis=2)),
            tops.mmin(_t(x), _t(m), dim=2).numpy(),
            rtol=1e-6,
        )
        # multi-dim with keepdim=True only: the reference's squeeze-based
        # keepdim=False path raises IndexError for positive dim tuples (its
        # own call sites always pass keepdim=True, lib/tensor_ops.py:292-302)
        np.testing.assert_allclose(
            np.asarray(W.mmax(x, m, axis=(1, 2), keepdims=True)),
            tops.mmax(_t(x), _t(m), dim=(1, 2), keepdim=True).numpy(),
            rtol=1e-6,
        )

    def test_mbest(self, rng):
        x = rng.normal(size=(4, 9)).astype(np.float32)
        m = rng.random((4, 9)) > 0.5
        m[:, :4] = False  # >= k valid per row
        np.testing.assert_allclose(
            np.asarray(W.mbest(x, 3, m, axis=1)),
            tops.mbest(_t(x), 3, _t(m), dim=1).numpy(),
            rtol=1e-5,
        )

    def test_mworst_reference_degeneracy_documented(self, rng):
        """PARITY.md deviation #1: the reference's mworst filter is x >= -inf
        (always true) so masked mworst collapses to ~0; ours keeps the k-max
        mean. Assert both behaviors so the deviation stays documented-true."""
        x = np.abs(rng.normal(size=(2, 6))).astype(np.float32) + 1.0
        m = np.zeros((2, 6), bool)
        ref = tops.mworst(_t(x), 2, _t(m), dim=1).numpy()
        ours = np.asarray(W.mworst(x, 2, m, axis=1))
        np.testing.assert_allclose(ref, 0.0, atol=1e-5)  # reference degenerate
        assert (ours > 0.5).all()  # our documented intent


class TestDistanceParity:
    @pytest.mark.parametrize(
        "mode", ["fro", "nfro", "euc", "neuc", "sqeuc", "nsqeuc", "cos", "cossim", "dot", "dotsim"]
    )
    def test_all_modes(self, rng, mode):
        x = rng.normal(size=(6, 12)).astype(np.float32)
        y = rng.normal(size=(9, 12)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(W.pairwise_distance_matrix(x, y, mode=mode)),
            tops.pairwise_distance_matrix(_t(x), _t(y), mode=mode).numpy(),
            rtol=1e-3, atol=1e-4,
        )

    def test_euclidean_squared(self, rng):
        x = rng.normal(size=(5, 8)).astype(np.float32)
        y = rng.normal(size=(4, 8)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(W.pairwise_euclidean_distance_matrix(x, y, squared=True)),
            tops.pairwise_euclidean_distance_matrix(_t(x), _t(y), squared=True).numpy(),
            rtol=1e-4, atol=1e-4,
        )


class TestFramingParity:
    def test_force_length_pads_cuts(self, rng):
        x = rng.normal(size=(2, 7)).astype(np.float32)
        for length, pad_mode, cut_mode in [
            (12, "repeat", "start"), (16, "zeros", "start"),
            (4, "repeat", "start"), (4, "repeat", "end"),
        ]:
            np.testing.assert_allclose(
                np.asarray(W.force_length(x, length, pad_mode=pad_mode, cut_mode=cut_mode)),
                tops.force_length(_t(x), length, pad_mode=pad_mode, cut_mode=cut_mode).numpy(),
                rtol=1e-6,
            )

    def test_frames(self, rng):
        x = rng.normal(size=(2, 29)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(W.frames(x, 6, 4, pad_end=True)),
            tops.frames(_t(x), 6, 4, pad_end=True).numpy(),
            rtol=1e-6,
        )

    def test_get_frames(self, rng):
        x = rng.normal(size=(1, 33)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(W.get_frames(x, 8, 5)),
            tops.get_frames(_t(x), 8, 5).numpy(),
            rtol=1e-6,
        )


class TestMiscParity:
    def test_covariance(self, rng):
        x = rng.normal(size=(50, 6)).astype(np.float32)
        np.testing.assert_allclose(
            float(W.covariance(x)), float(tops.covariance(_t(x))), rtol=1e-4
        )

    def test_tensor_quantile(self, rng):
        x = rng.normal(size=(4, 11)).astype(np.float32)
        q = np.full((4, 1), 0.3, np.float32)
        np.testing.assert_allclose(
            np.asarray(W.tensor_quantile(x, q, axis=-1)),
            tops.tensor_quantile(_t(x), _t(q), dim=-1).numpy(),
            rtol=1e-6,
        )


class TestReduxParity:
    @pytest.fixture
    def dist_mask(self, rng):
        d = rng.random((2, 3, 4, 6)).astype(np.float32) + 0.05
        m = rng.random(d.shape) > 0.6
        m[..., 0, 0] = False
        return d, m

    @pytest.mark.parametrize("redux", ["min", "max", "mean", "minmean", "meanmin", "smean", "sminmean"])
    def test_deterministic_modes(self, dist_mask, redux):
        d, m = dist_mask
        np.testing.assert_allclose(
            np.asarray(W.distance_tensor_redux(d, redux, mask=m)),
            tops.distance_tensor_redux(_t(d), redux, mask=_t(m)).numpy(),
            rtol=1e-4, atol=1e-5,
        )

    @pytest.mark.parametrize("redux", ["best", "best-4"])
    def test_best_modes(self, dist_mask, redux):
        d, m = dist_mask
        np.testing.assert_allclose(
            np.asarray(W.distance_tensor_redux(d, redux, mask=m)),
            tops.distance_tensor_redux(_t(d), redux, mask=_t(m)).numpy(),
            rtol=1e-4, atol=1e-5,
        )

    @pytest.mark.parametrize("redux", ["bpwr", "bpwr-2"])
    def test_bpwr(self, dist_mask, redux):
        # the reference adds 1e-7 tie-break jitter; continuous random data
        # makes the greedy selection path identical, values differ <= 1e-6
        d, m = dist_mask
        np.testing.assert_allclose(
            np.asarray(W.distance_tensor_redux(d, redux, mask=m)),
            tops.distance_tensor_redux(_t(d), redux, mask=_t(m)).numpy(),
            rtol=1e-3, atol=1e-5,
        )


class TestLayerParity:
    def test_mean_pool(self, rng):
        x = rng.normal(size=(2, 4, 9)).astype(np.float32)  # torch (B, C, T)
        mask = rng.random((2, 9)) > 0.3
        mask[:, 0] = True
        ref = ref_layers.MeanPool()(_t(x), _t(mask)).numpy()
        ours = np.asarray(WL.mean_pool(np.swapaxes(x, 1, 2), mask))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_gem_pool(self, rng):
        import jax

        x = np.abs(rng.normal(size=(2, 4, 5, 6))).astype(np.float32)  # (B,C,H,W)
        ref_mod = ref_layers.GeMPool(ncha=4, init=3)
        ref = ref_mod(_t(x)).detach().numpy()
        ours_mod = WL.GeMPool(features=4, p_init=3.0)
        xo = np.transpose(x, (0, 2, 3, 1))  # channel-last
        params = ours_mod.init(jax.random.PRNGKey(0), xo)["params"]
        ours = np.asarray(ours_mod.apply({"params": params}, xo))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_autopool(self, rng):
        import jax

        x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
        ref = ref_layers.AutoPool(ncha=3)(_t(x)).detach().numpy()
        xo = np.transpose(x, (0, 2, 3, 1))
        mod = WL.AutoPool(features=3)
        params = mod.init(jax.random.PRNGKey(0), xo)["params"]
        ours = np.asarray(mod.apply({"params": params}, xo))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_squeeze_excitation(self, rng):
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 6, 4, 4)).astype(np.float32)
        ref_mod = ref_layers.SqueezeExcitation2d(6, r=2)
        ref = ref_mod(_t(x)).detach().numpy()
        # copy torch weights into ours
        xo = np.transpose(x, (0, 2, 3, 1))
        mod = WL.SqueezeExcitation2d(6, r=2)
        params = mod.init(jax.random.PRNGKey(0), xo)["params"]
        params = {
            "fc1": {"kernel": ref_mod.mlp[0].weight.detach().numpy().T},
            "fc2": {"kernel": ref_mod.mlp[2].weight.detach().numpy().T},
        }
        ours = np.asarray(mod.apply({"params": params}, xo))
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
        )

    def test_cqt_prepare(self, rng):
        import jax

        x = rng.normal(size=(2, 1, 8, 10)).astype(np.float32)
        ref_mod = ref_layers.CQTPrepare(noise=False)
        ref = ref_mod(_t(x)).detach().numpy()
        xo = np.transpose(x, (0, 2, 3, 1))
        mod = WL.CQTPrepare(noise=False)
        params = mod.init(jax.random.PRNGKey(0), xo)["params"]
        ours = np.asarray(mod.apply({"params": params}, xo))
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-6
        )

    def test_conv_block(self, rng):
        """Executed parity for the WEALY projection-head block
        (lib/layers.py:32-58): Conv1d(no bias) -> ReLU -> LayerNorm, with a
        temporal stride. LN affines are identity at init on both sides."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 5, 12)).astype(np.float32)  # torch (B, C, T)
        ref_mod = ref_layers.ConvBlock(5, 7, kernel_size=3, stride=2).eval()
        with torch.no_grad():
            ref = ref_mod(_t(x)).numpy()
        xo = np.transpose(x, (0, 2, 1))  # (B, T, C)
        mod = WL.ConvBlock(7, kernel_size=3, stride=2)
        params = {
            "conv": {"kernel": ref_mod.conv.weight.detach().numpy()
                     .transpose(2, 1, 0)},
            "norm": dict(mod.init(jax.random.PRNGKey(0), xo)["params"]["norm"]),
        }
        ours = np.asarray(mod.apply({"params": params}, xo))
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 1)), rtol=1e-4, atol=1e-5
        )

    def test_soft_pool(self, rng):
        """Executed parity for SoftPool (lib/layers.py:229-242): split
        linear -> InstanceNorm'd softmax attention -> weighted sum."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 6, 9)).astype(np.float32)  # torch (B, C, S)
        ref_mod = ref_layers.SoftPool(6).eval()
        with torch.no_grad():
            ref = ref_mod(_t(x)).numpy()  # (B, C)
        xo = np.transpose(x, (0, 2, 1))  # (B, S, C)
        mod = WL.SoftPool(6)
        vs = mod.init(jax.random.PRNGKey(0), xo)
        params = jax.tree_util.tree_map(np.asarray, dict(vs["params"]))
        params["lin"] = {
            "kernel": ref_mod.lin.lin.weight.detach().numpy().T
        }
        ours = np.asarray(mod.apply({"params": params}, xo))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_resnet50_bott_block(self, rng):
        """Executed parity for the bottleneck block (lib/layers.py:248-294)
        with IBN + SE + strided conv-BN shortcut all enabled."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
        ref_mod = ref_layers.ResNet50BottBlock(
            4, 6, ncfactor=0.5, kern=3, stride=2, ibn=True, se=True
        ).eval()
        with torch.no_grad():
            ref = ref_mod(_t(x)).numpy()

        def conv_k(w):
            return w.detach().numpy().transpose(2, 3, 1, 0)

        xo = np.transpose(x, (0, 2, 3, 1))
        mod = WL.ResNet50BottBlock(4, 6, ncfactor=0.5, kern=3, stride=2,
                                   ibn=True, se=True)
        vs = mod.init(jax.random.PRNGKey(0), np.zeros_like(xo))
        params = jax.tree_util.tree_map(np.asarray, dict(vs["params"]))
        params["conv1"] = {"kernel": conv_k(ref_mod.convs[0].weight)}
        params["conv2"] = {"kernel": conv_k(ref_mod.convs[3].weight)}
        params["conv3"] = {"kernel": conv_k(ref_mod.convs[6].weight)}
        params["se"] = {
            "fc1": {"kernel": ref_mod.convs[8].mlp[0].weight.detach().numpy().T},
            "fc2": {"kernel": ref_mod.convs[8].mlp[2].weight.detach().numpy().T},
        }
        params["short_conv"] = {"kernel": conv_k(ref_mod.residual[0].weight)}
        ours = np.asarray(mod.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, xo,
            train=False,
        ))
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
        )

    def test_axis_linear(self, rng):
        """Executed parity for Linear-along-a-dim (lib/layers.py:105-118):
        the reference transposes dim<->-1 around a torch Linear; AxisLinear
        does the same with swapaxes. Exercised on the NON-trivial axis
        (torch dim=1 on a (B, C, T) tensor, no layout change on our side)."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 5, 7)).astype(np.float32)  # (B, C, T)
        ref_mod = ref_layers.Linear(5, 3, dim=1, bias=True).eval()
        with torch.no_grad():
            ref = ref_mod(_t(x)).numpy()  # (B, 3, T)
        mod = WL.AxisLinear(3, axis=1)
        params = {
            "lin": {
                "kernel": ref_mod.lin.weight.detach().numpy().T,
                "bias": ref_mod.lin.bias.detach().numpy(),
            }
        }
        ours = np.asarray(mod.apply({"params": params}, x))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_pad_conv2d(self, rng):
        """Executed parity for the same-padding odd-kernel Conv2d
        (lib/layers.py:121-133), strided + biased."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 3, 9, 9)).astype(np.float32)  # NCHW
        ref_mod = ref_layers.PadConv2d(3, 5, kern=3, stride=2, bias=True).eval()
        with torch.no_grad():
            ref = ref_mod(_t(x)).numpy()
        xo = np.transpose(x, (0, 2, 3, 1))
        mod = WL.PadConv2d(5, 3, stride=2, use_bias=True)
        params = {
            "conv": {
                "kernel": ref_mod.conv.weight.detach().numpy()
                .transpose(2, 3, 1, 0),
                "bias": ref_mod.conv.bias.detach().numpy(),
            }
        }
        ours = np.asarray(mod.apply({"params": params}, xo))
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
        )

    def test_instance_batch_norm_1d_eval(self, rng):
        """Executed parity for IBN-1d (lib/layers.py:163-176) in eval mode
        with NON-identity affines copied across (BN running stats are the
        0/1 init on both sides; torch InstanceNorm1d never tracks stats)."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(3, 6, 11)).astype(np.float32)  # (B, C, T)
        ref_mod = ref_layers.InstanceBatchNorm1d(6, affine=True).eval()
        with torch.no_grad():
            for m in (ref_mod.bn, ref_mod.inst):
                m.weight.copy_(torch.tensor(
                    rng.normal(size=3).astype(np.float32)))
                m.bias.copy_(torch.tensor(
                    rng.normal(size=3).astype(np.float32)))
            ref = ref_mod(_t(x)).numpy()
        xo = np.transpose(x, (0, 2, 1))  # (B, T, C)
        mod = WL.InstanceBatchNorm(6)
        vs = mod.init(jax.random.PRNGKey(0), xo)
        params = {
            "bn": {
                "scale": ref_mod.bn.weight.detach().numpy(),
                "bias": ref_mod.bn.bias.detach().numpy(),
            },
            "inst": {
                "scale": ref_mod.inst.weight.detach().numpy(),
                "bias": ref_mod.inst.bias.detach().numpy(),
            },
        }
        ours = np.asarray(mod.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, xo,
            train=False,
        ))
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 1)), rtol=1e-4, atol=1e-5
        )

    def test_instance_batch_norm_2d_train(self, rng):
        """IBN-2d (lib/layers.py:179-192) in TRAIN mode: both frameworks
        normalize the BN half with biased per-batch statistics, so outputs
        must agree even though running-stat bookkeeping differs."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)  # NCHW
        ref_mod = ref_layers.InstanceBatchNorm2d(4, affine=True).train()
        with torch.no_grad():
            ref = ref_mod(_t(x)).numpy()
        xo = np.transpose(x, (0, 2, 3, 1))
        mod = WL.InstanceBatchNorm(4)
        vs = mod.init(jax.random.PRNGKey(0), xo)
        ours, _ = mod.apply(
            {"params": vs["params"], "batch_stats": vs["batch_stats"]}, xo,
            train=True, mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(ours), np.transpose(ref, (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-5,
        )

    def test_squeeze_unsqueeze(self, rng):
        """lib/layers.py:138-157 Squeeze/Unsqueeze are Sequential-plumbing
        wrappers; wealy_tpu deliberately uses plain jnp ops (PARITY.md).
        Executed here to pin the axis semantics anyway."""
        import jax.numpy as jnp

        x = rng.normal(size=(2, 1, 5)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(jnp.squeeze(x, axis=1)),
            ref_layers.Squeeze(dim=1)(_t(x)).numpy(),
        )
        np.testing.assert_array_equal(
            np.asarray(jnp.expand_dims(x, axis=-1)),
            ref_layers.Unsqueeze(dim=-1)(_t(x)).numpy(),
        )

    def test_ibn_res_block(self, rng):
        """Executed parity for the CLEWS residual core (lib/layers.py:
        300-348): IBN-pre + SE-post + strided skip branch, torch weights
        copied into the channel-last flax re-design. Norm affines are
        identity at init in BOTH frameworks (BN eval-mode running stats
        0/1, IN affine 1/0), so only convs, SE linears and the residual
        gain need conversion — the gain is zero-init (the reference's
        stabilization trick), so it is set to 0.7 on both sides to make
        the conv branch actually count."""
        import jax

        torch.manual_seed(0)
        x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)  # NCHW
        ref_mod = ref_layers.MyIBNResBlock(
            4, 6, factor=0.5, kern=3, stride=2, ibn="pre", se="post"
        ).eval()
        with torch.no_grad():
            ref_mod.gain.fill_(0.7)
            ref = ref_mod(_t(x)).numpy()

        def conv_k(w):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
            return w.detach().numpy().transpose(2, 3, 1, 0)

        xo = np.transpose(x, (0, 2, 3, 1))
        mod = WL.MyIBNResBlock(4, 6, factor=0.5, kern=3, stride=2,
                               ibn="pre", se="post")
        vs = mod.init(jax.random.PRNGKey(0), np.zeros_like(xo))
        params = jax.tree_util.tree_map(np.asarray, dict(vs["params"]))
        params["conv1"] = {"conv": {"kernel": conv_k(ref_mod.convs[2].conv.weight)}}
        params["conv2"] = {"conv": {"kernel": conv_k(ref_mod.convs[5].conv.weight)}}
        params["skip_conv"] = {"conv": {"kernel": conv_k(ref_mod.skip[2].conv.weight)}}
        params["se_post"] = {
            "fc1": {"kernel": ref_mod.convs[6].mlp[0].weight.detach().numpy().T},
            "fc2": {"kernel": ref_mod.convs[6].mlp[2].weight.detach().numpy().T},
        }
        params["gain"] = np.full((1,), 0.7, np.float32)
        ours = np.asarray(mod.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, xo,
            train=False,
        ))
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
        )


def _ref_losses():
    """Import the reference's lib/losses.py by stubbing its unused
    pytorch_metric_learning import (it is imported at module top but never
    referenced — losses.py:4-5 vs the rest of the file). Executing the
    reference's own loss code is stronger parity evidence than the numpy
    oracles in tests/test_losses.py."""
    import types

    if "pytorch_metric_learning" not in sys.modules:
        stub = types.ModuleType("pytorch_metric_learning")
        stub.losses = types.ModuleType("pytorch_metric_learning.losses")
        stub.miners = types.ModuleType("pytorch_metric_learning.miners")
        sys.modules["pytorch_metric_learning"] = stub
        sys.modules["pytorch_metric_learning.losses"] = stub.losses
        sys.modules["pytorch_metric_learning.miners"] = stub.miners
    return import_ref("losses")


def _loss_batch(rng, B=16, C=8):
    """Batch with positives (label pairs), negatives, distinct idx."""
    labels = np.repeat(np.arange(B // 2), 2).astype(np.int64)
    idx = np.arange(B).astype(np.int64)
    z = rng.normal(size=(B, C)).astype(np.float32)
    return labels, idx, z


class TestLossParity:
    """The reference's own CLEWSLoss / NTXentLoss / TripletLoss executed
    side-by-side with wealy_tpu.losses on identical inputs."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(0)

    @pytest.mark.parametrize("step", [0, 250, 5000])
    def test_clews_matches_reference(self, rng, step):
        from wealy_tpu.losses.clews import clews_loss

        ref = _ref_losses().CLEWSLoss()
        labels, idx, z = _loss_batch(rng)
        extra = {"global_step": step}
        want, want_log = ref(
            torch.from_numpy(labels), torch.from_numpy(idx),
            torch.from_numpy(z.copy()), extra=extra,
        )
        got, got_log = clews_loss(labels, idx, z, extra=extra)
        np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(got_log["l_cent"]), float(want_log["l_cent"]), rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            float(got_log["l_cont"]), float(want_log["l_cont"]), rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            float(got_log["uniformity_weight"]),
            float(want_log["uniformity_weight"]), rtol=1e-6, atol=0,
        )

    def test_clews_not_numerically_friendly_branch(self, rng):
        from wealy_tpu.losses.clews import clews_loss

        ref = _ref_losses().CLEWSLoss()
        labels, idx, z = _loss_batch(rng)
        want, _ = ref(
            torch.from_numpy(labels), torch.from_numpy(idx),
            torch.from_numpy(z.copy()), extra={"global_step": 99},
            numerically_friendly=False,
        )
        got, _ = clews_loss(
            labels, idx, z, extra={"global_step": 99},
            numerically_friendly=False,
        )
        np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=1e-6)

    def test_ntxent_matches_reference(self, rng):
        from wealy_tpu.losses.ntxent import ntxent_loss

        ref = _ref_losses().NTXentLoss(temperature=0.1)
        labels, idx, z = _loss_batch(rng)
        want, _ = ref(
            torch.from_numpy(labels), torch.from_numpy(idx),
            torch.from_numpy(z.copy()),
        )
        got, _ = ntxent_loss(labels, idx, z, temperature=0.1)
        np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=1e-6)

    def test_triplet_matches_reference(self, rng):
        from wealy_tpu.losses.triplet import triplet_loss

        ref = _ref_losses().TripletLoss(margin=0.2)
        labels, idx, z = _loss_batch(rng)
        want, _ = ref(
            torch.from_numpy(labels), torch.from_numpy(idx),
            torch.from_numpy(z.copy()),
        )
        got, _ = triplet_loss(labels, idx, z, margin=0.2)
        np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=1e-6)

    def test_triplet_no_valid_triplets(self, rng):
        """All-same-label batch after the noise-injection branch; both sides
        agree (the reference injects -1 labels in place)."""
        from wealy_tpu.losses.triplet import triplet_loss

        ref = _ref_losses().TripletLoss(margin=0.2)
        B = 8
        labels = np.zeros(B, np.int64)
        idx = np.arange(B).astype(np.int64)
        z = rng.normal(size=(B, 8)).astype(np.float32)
        want, _ = ref(
            torch.from_numpy(labels.copy()), torch.from_numpy(idx),
            torch.from_numpy(z.copy()),
        )
        got, _ = triplet_loss(labels, idx, z, margin=0.2)
        np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=1e-6)


class _ConfShim:
    """Minimal OmegaConf-like conf for the reference's create_collate_fn
    (it only calls conf.data.get / conf.model.get)."""

    class _Section(dict):
        def get(self, k, default=None):
            return dict.get(self, k, default)

    def __init__(self, data=None, model=None):
        self.data = self._Section(data or {})
        self.model = self._Section(model or {})


def _mk_items(rng, B=4, n=2, C=6, lengths=(7, 12, 3, 10, 15, 9, 12, 5)):
    """Paired our-format / reference-format single-modal batches."""
    ours, ref = [], []
    it = iter(lengths)
    for i in range(B):
        versions, ref_item = [], [i]
        for j in range(n):
            vid = 10 * i + j
            emb = rng.normal(size=(next(it), C)).astype(np.float32)
            versions.append((vid, emb))
            ref_item += [vid, torch.from_numpy(emb)]
        ours.append((i, versions))
        ref.append(ref_item)
    return ours, ref


class TestCollateParity:
    """The reference's own collate_functions.py executed side-by-side with
    wealy_tpu.data.chunking / collate_factory on identical inputs."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(0)

    @pytest.fixture
    def ref_collate(self):
        import types

        if "omegaconf" not in sys.modules:
            # the reference package __init__ pulls metadata_loaders, which
            # imports OmegaConf only for OmegaConf.select — shim it
            class _OC:
                @staticmethod
                def select(cfg, key, default=None):
                    cur = cfg
                    for part in key.split("."):
                        cur = getattr(cur, part, None)
                        if cur is None:
                            return default
                    return cur

            mod = types.ModuleType("omegaconf")
            mod.OmegaConf = _OC
            sys.modules["omegaconf"] = mod
        return import_ref("embedding_dataset.collate_functions")

    def _cmp_fixed(self, ref_out, batch, n=2):
        np.testing.assert_array_equal(np.asarray(ref_out[0]), batch.clique_ids)
        for j in range(n):
            np.testing.assert_array_equal(
                np.asarray(ref_out[1 + j * 3]), batch.version_ids[:, j]
            )
            np.testing.assert_allclose(
                np.asarray(ref_out[2 + j * 3]), batch.embeddings[:, j], rtol=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(ref_out[3 + j * 3]), batch.masks[:, j]
            )

    def test_fixed_length_deterministic(self, rng, ref_collate):
        from wealy_tpu.data.chunking import collate_fixed_length

        ours, ref = _mk_items(rng)
        want = ref_collate.collate_embeddings_fixed_length(
            ref, use_random_chunks=False, chunk_size=10
        )
        got = collate_fixed_length(ours, chunk_size=10, use_random_chunks=False)
        self._cmp_fixed(want, got)

    def test_fixed_length_clews_type(self, rng, ref_collate):
        """CLEWS fixed-shape override: full sequence, no chunking."""
        from wealy_tpu.data.chunking import collate_fixed_length

        ours, ref = _mk_items(rng, lengths=(16,) * 8)
        want = ref_collate.collate_embeddings_fixed_length(
            ref, use_random_chunks=False, chunk_size=4, embedding_type="clews"
        )
        got = collate_fixed_length(
            ours, chunk_size=4, use_random_chunks=False, embedding_type="clews"
        )
        assert got.embeddings.shape[2] == 16  # fixed shape kept
        self._cmp_fixed(want, got)

    def test_avg_pooling(self, rng, ref_collate):
        from wealy_tpu.data.chunking import collate_avg_pool

        ours, ref = _mk_items(rng)
        want = ref_collate.collate_embeddings_fixed_length(
            ref, use_avg_pooling=True
        )
        got = collate_avg_pool(ours)
        np.testing.assert_array_equal(np.asarray(want[0]), got.clique_ids)
        for j in range(2):
            np.testing.assert_allclose(
                np.asarray(want[2 + j * 3]), got.embeddings[:, j],
                rtol=1e-5, atol=1e-7,
            )
            np.testing.assert_array_equal(
                np.asarray(want[3 + j * 3]), got.masks[:, j]
            )

    def test_overlapping_chunks(self, rng, ref_collate):
        """Test-mode overlapping windows: same chunk tensor, same
        (batch_idx, version_idx, chunk_idx) chunk_info rows."""
        from wealy_tpu.data.chunking import collate_overlapping

        ours, ref = _mk_items(rng, B=2, lengths=(25, 9, 14, 30))
        want = ref_collate.collate_embeddings_fixed_length(
            ref, use_random_chunks=False, chunk_size=10,
            use_overlapping_chunks=True, overlap_percentage=0.5,
        )
        got = collate_overlapping(ours, chunk_size=10, overlap=0.5)
        # reference layout: [clique_ids, version_ids, embeddings, masks,
        # chunk_info], REAL chunks only; ours pads the chunk count to a
        # bucket multiple with chunk_valid — compare the valid rows
        keep = got.chunk_valid
        np.testing.assert_allclose(
            np.asarray(want[2]), got.embeddings[keep], rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(want[3]), got.masks[keep])
        np.testing.assert_array_equal(np.asarray(want[4]), got.chunk_info[keep])

    def test_wealy_clews_deterministic(self, rng, ref_collate):
        from wealy_tpu.data.collate_factory import collate_wealy_clews

        B, n, L, C = 3, 2, 5, 4
        ours, ref = [], []
        for i in range(B):
            versions, ref_item = [], [i]
            for j in range(n):
                vid = 10 * i + j
                mm = {
                    "wealy": {"embeddings": rng.normal(size=(3, 8)).astype(np.float32)},
                    "full_clews": rng.normal(size=(L, C)).astype(np.float32),
                    "avg_clews": rng.normal(size=(C,)).astype(np.float32),
                    "clews_mask": rng.random(L) > 0.7,  # True = invalid
                }
                versions.append((vid, mm))
                ref_item += [vid, {
                    "wealy": {"embeddings": torch.from_numpy(mm["wealy"]["embeddings"])},
                    "full_clews": torch.from_numpy(mm["full_clews"]),
                    "avg_clews": torch.from_numpy(mm["avg_clews"]),
                    "clews_mask": torch.from_numpy(mm["clews_mask"]),
                }]
            ours.append((i, versions))
            ref.append(ref_item)

        conf = _ConfShim(model={"name": "wealy-clews"})
        fn = ref_collate.create_collate_fn(conf, deterministic=True)
        want = fn(ref)
        got = collate_wealy_clews(ours, wealy_mode="deterministic")
        np.testing.assert_array_equal(np.asarray(want[0]), got["clique_ids"])
        for j in range(n):
            base = 1 + j * 5
            np.testing.assert_array_equal(
                np.asarray(want[base]), got["version_ids"][:, j]
            )
            np.testing.assert_allclose(
                np.asarray(want[base + 1]), got["wealy"][:, j], rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(want[base + 2]), got["full_clews"][:, j], rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(want[base + 3]), got["avg_clews"][:, j], rtol=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(want[base + 4]), got["clews_mask"][:, j]
            )

    def test_wealy_test_mode(self, rng, ref_collate):
        from wealy_tpu.data.collate_factory import wealy_test_mode_items

        B, n = 2, 2
        ours, ref = [], []
        for i in range(B):
            versions, ref_item = [], [i]
            for j in range(n):
                vid = 10 * i + j
                mm = {
                    "wealy": {"embeddings": rng.normal(size=(2 + j, 8)).astype(np.float32)},
                    "full_clews": rng.normal(size=(4, 4)).astype(np.float32),
                    "avg_clews": rng.normal(size=(4,)).astype(np.float32),
                    "clews_mask": np.zeros(4, bool),
                }
                versions.append((vid, mm))
                ref_item += [vid, {
                    k: ({"embeddings": torch.from_numpy(v["embeddings"])}
                        if k == "wealy" else torch.from_numpy(v))
                    for k, v in mm.items()
                }]
            ours.append((i, versions))
            ref.append(ref_item)

        want = ref_collate.handle_wealy_test_mode(ref, n_per_class=n)
        got = wealy_test_mode_items(ours)
        assert len(want) == len(got)
        for w, g in zip(want, got):
            assert w["clique_id"] == g["clique_id"]
            assert w["version_id"] == g["version_id"]
            assert (w["batch_idx"], w["version_idx"]) == (g["batch_idx"], g["version_idx"])
            np.testing.assert_allclose(
                np.asarray(w["wealy_all_chunks"]), g["wealy_all_chunks"], rtol=1e-6
            )

    def test_whisper_clews_uniform_seq(self, rng, ref_collate):
        """whisper-clews 6-item collate with uniform seq lengths (the
        reference assumes them; our collate's chunking is the identity when
        T == chunk_size)."""
        from wealy_tpu.data.collate_factory import collate_whisper_clews

        B, n, T, Cw, L, C = 3, 2, 8, 6, 4, 4
        ours, ref = [], []
        for i in range(B):
            versions, ref_item = [], [i]
            for j in range(n):
                vid = 10 * i + j
                seq = rng.normal(size=(T, Cw)).astype(np.float32)
                mm_ours = {
                    "whisper_seq": seq,
                    "full_clews": rng.normal(size=(L, C)).astype(np.float32),
                    "avg_clews": rng.normal(size=(C,)).astype(np.float32),
                    "clews_mask": np.zeros(L, bool),
                }
                versions.append((vid, mm_ours))
                ref_item += [vid, {
                    "whisper": torch.from_numpy(seq),
                    "whisper_mask": torch.zeros(T, dtype=torch.bool),
                    "full_clews": torch.from_numpy(mm_ours["full_clews"]),
                    "avg_clews": torch.from_numpy(mm_ours["avg_clews"]),
                    "clews_mask": torch.from_numpy(mm_ours["clews_mask"]),
                }]
            ours.append((i, versions))
            ref.append(ref_item)

        conf = _ConfShim(model={"name": "whisper-clews"})
        fn = ref_collate.create_collate_fn(conf)
        want = fn(ref)
        got = collate_whisper_clews(ours, chunk_size=T, use_random_chunks=False)
        np.testing.assert_array_equal(np.asarray(want[0]), got["clique_ids"])
        for j in range(n):
            base = 1 + j * 6
            np.testing.assert_array_equal(
                np.asarray(want[base]), got["version_ids"][:, j]
            )
            np.testing.assert_allclose(
                np.asarray(want[base + 1]), got["whisper_seq"][:, j], rtol=1e-6
            )
            # conventions agree: reference whisper_mask True=invalid, ours too
            np.testing.assert_array_equal(
                np.asarray(want[base + 2]), got["whisper_mask"][:, j]
            )
            np.testing.assert_allclose(
                np.asarray(want[base + 3]), got["full_clews"][:, j], rtol=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(want[base + 5]), got["clews_mask"][:, j]
            )
