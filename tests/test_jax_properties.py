"""JAX-property tests: the numeric layer composes under jit/vmap/grad —
the functional-transform guarantees a TPU-native library must keep."""

import jax
import jax.numpy as jnp
import numpy as np

from wealy_tpu.losses import clews_loss, ntxent_loss, triplet_loss
from wealy_tpu.ops.distance import pairwise_distance_matrix
from wealy_tpu.ops.framing import force_length, get_frames
from wealy_tpu.ops.redux import distance_tensor_redux


def test_losses_vmap_over_batches(rng):
    """vmap a loss over a stack of independent batches."""
    labels = np.repeat(np.arange(4, dtype=np.int32), 2)
    idx = np.arange(8, dtype=np.int32)
    zs = rng.normal(size=(5, 8, 16)).astype(np.float32)

    def one(z):
        return clews_loss(labels, idx, z)[0]

    losses = jax.jit(jax.vmap(one))(jnp.asarray(zs))
    assert losses.shape == (5,)
    one_j = jax.jit(one)  # eager per-primitive dispatch is slow on the CI box
    for i in range(5):
        np.testing.assert_allclose(
            float(losses[i]), float(one_j(zs[i])), rtol=1e-5
        )


def test_losses_jit_grad_compose(rng):
    labels = np.repeat(np.arange(4, dtype=np.int32), 2)
    idx = np.arange(8, dtype=np.int32)
    z = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    for fn in (ntxent_loss, triplet_loss, clews_loss):
        g = jax.jit(jax.grad(lambda z: fn(labels, idx, z)[0]))(z)
        assert bool(jnp.all(jnp.isfinite(g)))


def test_redux_vmap_over_corpora(rng):
    d = rng.random((3, 2, 2, 4, 5)).astype(np.float32)
    out = jax.vmap(lambda x: distance_tensor_redux(x, "meanmin"))(jnp.asarray(d))
    assert out.shape == (3, 2, 2)
    np.testing.assert_allclose(
        np.asarray(out[1]),
        np.asarray(distance_tensor_redux(d[1], "meanmin")),
        rtol=1e-6,
    )


def test_framing_random_modes_under_jit(rng):
    x = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))

    @jax.jit
    def f(x, key):
        return force_length(x, 4, cut_mode="random", key=key)

    a = f(x, jax.random.PRNGKey(0))
    b = f(x, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # key-deterministic
    c = f(x, jax.random.PRNGKey(1))
    assert a.shape == c.shape == (2, 4)


def test_get_frames_grad(rng):
    x = jnp.asarray(rng.normal(size=(1, 20)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(get_frames(x, 6, 3) ** 2))(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_pairwise_distance_grad_at_duplicate_rows(rng):
    """The sqrt-at-zero stabilization must keep grads finite when x == y."""
    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(pairwise_distance_matrix(x, x, mode="euc")))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
