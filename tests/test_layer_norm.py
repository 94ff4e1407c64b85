"""Fused LayerNorm kernel: interpret-mode parity, gradients, module facade."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from wealy_tpu.ops.layer_norm import _ln_fwd_impl, _reference_ln, fused_layer_norm


def test_interpret_matches_reference(rng):
    x = jnp.asarray(rng.normal(size=(3, 70, 384)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(384,)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    want = np.asarray(_reference_ln(x, scale, bias, 1e-5))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_ln_fwd_impl(x, scale, bias, 1e-5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bf16_io(rng):
    x = jnp.asarray(rng.normal(size=(16, 384))).astype(jnp.bfloat16)
    scale, bias = jnp.ones(384), jnp.zeros(384)
    with pltpu.force_tpu_interpret_mode():
        got = _ln_fwd_impl(x, scale, bias, 1e-5)
    assert got.dtype == jnp.bfloat16
    want = _reference_ln(x, scale, bias, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_cpu_fallback_exact(rng):
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    scale, bias = jnp.ones(64) * 1.5, jnp.zeros(64) + 0.1
    np.testing.assert_allclose(
        np.asarray(fused_layer_norm(x, scale, bias)),
        np.asarray(_reference_ln(x, scale, bias, 1e-5)),
        rtol=1e-6,
    )


def test_grad_matches(rng):
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    scale = jnp.ones(32) * 1.2
    bias = jnp.zeros(32)
    g1 = jax.grad(lambda x: jnp.sum(fused_layer_norm(x, scale, bias) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(_reference_ln(x, scale, bias, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_module_param_names(rng):
    from wealy_tpu.models.layers import LayerNormFused

    x = rng.normal(size=(2, 10, 16)).astype(np.float32)
    mod = LayerNormFused()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"scale", "bias"}  # nn.LayerNorm-compatible
    out = mod.apply({"params": params}, x)
    assert out.shape == x.shape
