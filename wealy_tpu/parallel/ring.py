"""Ring attention: exact context parallelism over a mesh axis (ICI).

The reference never runs attention in-repo and handles long inputs purely by
chunking policies (SURVEY.md §5.7, /root/reference/lib/embedding_dataset/
collate_functions.py:174-374); nothing in the capability set REQUIRES
sequence parallelism at the 30 s Whisper window (1500 frames). This module is
the §5.7 "natural extension" for the day attention must run over sequences
too long for one chip's HBM: the TIME axis of q/k/v shards over a mesh axis,
each chip keeps its query block resident, and the K/V blocks rotate around
the ring via ``lax.ppermute`` while a flash-style online softmax accumulates
the exact result — the full (T, T) score matrix never exists on any chip,
and per step the only cross-chip traffic is one local K/V block over ICI.

Cost model: per device, ``n`` steps of a (B, H, Tq/n, D)x(B, H, D, Tk/n)
matmul pair (same total FLOPs as single-device attention) + ``n-1`` ppermutes
of the (B, Tk/n, H, D) K/V blocks. Compute per step is O(T²/n²) while the
hop is O(T/n): for T large enough the rotation hides entirely behind the MXU
(the classic ring-attention overlap — XLA schedules the ppermute of step i+1
concurrently with step i's matmuls since they have no data dependence).

Exact, not approximate: the online rescaling is the standard flash-attention
recurrence in f32, so the result equals single-device softmax attention to
float tolerance (asserted in tests/test_ring.py, which also checks grads —
the whole schedule is a ``lax.scan`` of differentiable collectives, so
``jax.grad`` rides the ppermute transposes like the GPipe schedule in
pp.py). Differs from the Megatron sequence parallelism in tp.py
(``tp_encode_fn(sequence_parallel=True)``): that shards only the
LN/elementwise regions between Megatron blocks and still materializes full-T
attention per chip; ring attention shards the attention itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG_BIG = -1e30  # finite "masked" score: keeps the running max finite even
# when an entire rotated K/V block is padding.


def make_cp_mesh(n_cp: int, n_data: int = 1, devices=None) -> Mesh:
    """A ("data", "cp") mesh: batch rows shard over ``data``, the sequence
    (context) axis over ``cp``. With n_data=1 this is a pure ring."""
    import numpy as np

    if devices is None:
        devices = jax.devices()[: n_data * n_cp]
    return Mesh(np.asarray(devices).reshape(n_data, n_cp), ("data", "cp"))


def _ring_body(q, k0, v0, mask0, *, scale: float, axis: str, n_dev: int):
    """Per-device ring schedule. q: (B, Tq, H, D) resident query block;
    k0/v0: (B, Tk, H, D) this device's K/V block; mask0: (B, Tk) True=valid.
    All accumulation in f32 regardless of input dtype."""
    b, tq, h, d = q.shape
    qf = q.astype(jnp.float32) * scale

    m = jnp.full((b, h, tq), _NEG_BIG, jnp.float32)
    l = jnp.zeros((b, h, tq), jnp.float32)
    acc = jnp.zeros((b, h, tq, d), jnp.float32)

    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def step(carry, _):
        k_blk, v_blk, m_blk, m_run, l_run, acc_run = carry
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32)
        )
        s = jnp.where(m_blk[:, None, None, :], s, _NEG_BIG)
        m_new = jnp.maximum(m_run, s.max(axis=-1))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(s - m_new[..., None])
        # Masked columns contribute exp(_NEG_BIG - m_new) which underflows to
        # exactly 0 whenever any valid column exists; re-zero explicitly so a
        # fully-masked block adds nothing even when m_new == _NEG_BIG.
        p = jnp.where(m_blk[:, None, None, :], p, 0.0)
        l_new = l_run * alpha + p.sum(axis=-1)
        acc_new = acc_run * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32)
        )
        k_blk = lax.ppermute(k_blk, axis, perm)
        v_blk = lax.ppermute(v_blk, axis, perm)
        m_blk = lax.ppermute(m_blk, axis, perm)
        return (k_blk, v_blk, m_blk, m_new, l_new, acc_new), None

    (_, _, _, _, l, acc), _ = lax.scan(
        step, (k0, v0, mask0, m, l, acc), None, length=n_dev
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ring_attention(
    q,
    k,
    v,
    scale: float,
    mesh: Mesh,
    axis: str = "cp",
    kv_mask=None,
    data_axis: str | None = "data",
):
    """Exact multi-head attention with the sequence axis sharded over
    ``axis``. q/k/v: (B, T, H, D) GLOBAL arrays (T % mesh.shape[axis] == 0;
    pad + mask ragged tails). kv_mask: optional (B, T) bool, True=valid
    (the layers.py convention). If ``data_axis`` names a mesh axis, the
    batch dim additionally shards over it (composes cp with dp)."""
    n_dev = mesh.shape[axis]
    if q.shape[1] % n_dev or k.shape[1] % n_dev:
        raise ValueError(
            f"sequence length {q.shape[1]}/{k.shape[1]} not divisible by "
            f"mesh axis {axis!r} size {n_dev}; pad and pass kv_mask"
        )
    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], dtype=bool)
    dp = data_axis if (data_axis and data_axis in mesh.shape) else None
    spec = P(dp, axis, None, None)
    fn = shard_map(
        functools.partial(_ring_body, scale=scale, axis=axis, n_dev=n_dev),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(dp, axis)),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, kv_mask)
