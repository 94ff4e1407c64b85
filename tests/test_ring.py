"""Ring attention (parallel/ring.py): the ppermute ring schedule must equal
single-device softmax attention exactly — it is a re-scheduling of the same
math, like the GPipe schedule in pp.py. The reference has no attention and
no parallelism in-repo (SURVEY.md §2.8, §5.7); this is the §5.7 long-context
extension component."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wealy_tpu.parallel.ring import make_cp_mesh, ring_attention


def _reference(q, k, v, scale, kv_mask=None):
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


def _rand_qkv(rng, b=2, t=48, h=3, d=8, dtype=np.float32):
    def one():
        return jnp.asarray(rng.normal(size=(b, t, h, d)).astype(dtype))
    return one(), one(), one()


@pytest.mark.parametrize("n_cp", [2, 4, 8])
def test_ring_matches_single_device(n_cp):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    scale = 1.0 / np.sqrt(q.shape[-1])
    mesh = make_cp_mesh(n_cp, devices=jax.devices()[:n_cp])
    got = np.asarray(ring_attention(q, k, v, scale, mesh))
    want = np.asarray(_reference(q, k, v, scale))
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-5, f"n_cp={n_cp}: max_err={err}"


def test_ring_with_padding_mask():
    """Ragged sequences: padded K/V positions (True=valid mask, the layers.py
    convention) must not contribute — including a device whose entire block
    is padding."""
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, t=32)
    scale = 0.25
    mask = np.ones((2, 32), dtype=bool)
    mask[0, 10:] = False   # device 2/3 blocks fully masked for row 0
    mask[1, 29:] = False
    mask = jnp.asarray(mask)
    mesh = make_cp_mesh(4, devices=jax.devices()[:4])
    got = np.asarray(ring_attention(q, k, v, scale, mesh, kv_mask=mask))
    want = np.asarray(_reference(q, k, v, scale, kv_mask=mask))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ring_composes_with_dp():
    """(data, cp) mesh: batch rows shard over data while each row's sequence
    rings over cp — same result."""
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, b=4, t=24)
    scale = 0.3
    mesh = make_cp_mesh(4, n_data=2, devices=jax.devices()[:8])
    got = np.asarray(ring_attention(q, k, v, scale, mesh))
    want = np.asarray(_reference(q, k, v, scale))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ring_is_trainable():
    """jax.grad rides the scan + ppermute transposes: grads wrt q/k/v match
    the single-device attention grads."""
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, b=1, t=16, h=2, d=4)
    scale = 0.5
    mesh = make_cp_mesh(4, devices=jax.devices()[:4])
    w = jnp.asarray(rng.normal(size=(1, 16, 2, 4)).astype(np.float32))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, scale, mesh) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, scale) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ring, g_ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err < 1e-5, f"d{name}: max_err={err}"


def test_ring_bf16_inputs():
    """bf16 q/k/v (the extraction dtype) accumulate in f32 inside the ring:
    result within bf16 noise of the f32-computed reference."""
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, t=32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    scale = 0.25
    mesh = make_cp_mesh(4, devices=jax.devices()[:4])
    got = np.asarray(
        ring_attention(qb, kb, vb, scale, mesh), dtype=np.float32
    )
    want = np.asarray(_reference(q, k, v, scale))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_ring_rejects_indivisible_seq():
    mesh = make_cp_mesh(4, devices=jax.devices()[:4])
    q = jnp.zeros((1, 30, 2, 4))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, q, q, 0.5, mesh)
