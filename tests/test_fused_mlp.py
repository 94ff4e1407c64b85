"""Fused MLP kernel tests: interpret parity, erf approximation accuracy,
gradients, CPU fallback."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from wealy_tpu.ops.fused_mlp import (
    _erf_approx,
    _mlp_fwd_impl,
    _reference_mlp,
    fused_mlp,
)


def _weights(rng, D=64, Dh=256):
    w1 = jnp.asarray(rng.normal(size=(D, Dh)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(Dh,)).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rng.normal(size=(Dh, D)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01)
    return w1, b1, w2, b2


def test_erf_approx_accuracy():
    import math

    x = jnp.linspace(-4.0, 4.0, 2001)
    got = np.asarray(_erf_approx(x))
    want = np.array([math.erf(float(v)) for v in np.asarray(x)])
    np.testing.assert_allclose(got, want, atol=1e-6)  # 1.5e-7 formula + f32 rounding


def test_interpret_matches_reference(rng):
    w1, b1, w2, b2 = _weights(rng)
    x = jnp.asarray(rng.normal(size=(2, 37, 64)).astype(np.float32))
    want = np.asarray(_reference_mlp(x, w1, b1, w2, b2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_mlp_fwd_impl(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cpu_fallback_exact(rng):
    w1, b1, w2, b2 = _weights(rng)
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_mlp(x, w1, b1, w2, b2)),
        np.asarray(_reference_mlp(x, w1, b1, w2, b2)),
        rtol=1e-6,
    )


def test_grad_matches(rng):
    w1, b1, w2, b2 = _weights(rng, D=16, Dh=32)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    g1 = jax.grad(lambda x, w: jnp.sum(fused_mlp(x, w, b1, w2, b2) ** 2), argnums=(0, 1))(x, w1)
    g2 = jax.grad(lambda x, w: jnp.sum(_reference_mlp(x, w, b1, w2, b2) ** 2), argnums=(0, 1))(x, w1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
