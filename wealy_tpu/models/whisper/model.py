"""Flax Whisper encoder/decoder, TPU-first.

Design notes (vs the public PyTorch architecture):
  - bf16 compute / f32 params by default; attention logits, softmax and
    LayerNorm always run in f32 (the parity-critical accumulations — SURVEY.md
    §7 "hard parts": bf16 vs fp16 tolerance).
  - Attention is a single fused einsum pair with ``preferred_element_type``
    so the MXU accumulates in f32; a Pallas flash-attention drop-in lives in
    wealy_tpu.models.whisper.attention (used automatically for long contexts).
  - The decoder supports an explicit KV cache pytree for greedy decoding under
    ``lax.while_loop`` (no Python-loop generation).
  - Weight layout converts 1:1 from Hugging Face WhisperModel state dicts
    (convert.py) — golden parity is tested against transformers on CPU.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from wealy_tpu.models.whisper.config import WhisperConfig


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Fixed sinusoidal position embedding (sin | cos concatenation)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


class MultiHeadAttention(nn.Module):
    """Whisper-style MHA: q/k scaled by d_head**-0.25 each, k_proj has no bias.

    ``use_flash``: route mask-free, cache-free self-attention (the encoder
    case) through the fused Pallas kernel (wealy_tpu.ops.flash_attention),
    which never materializes the (T, T) score matrix in HBM. Masked/causal/
    cached paths (decoder) keep the XLA einsum implementation.
    """

    n_state: int
    n_head: int
    dtype: Any = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        xa=None,
        mask=None,
        kv_cache=None,
        cache_index=None,
        xa_kv=None,
        only_kv: bool = False,
    ):
        """x: (B, Tq, D) queries. xa: optional (B, Tk, D) cross-attn memory.

        kv_cache: optional (k, v) arrays of shape (B, Tmax, H, Dh) to update
        in-place at ``cache_index`` (self-attn incremental decode). Returns
        (out, new_kv_cache).

        xa_kv: optional precomputed cross-attention (k, v) in DECODE layout —
        k (B, H, Dh, Tk) pre-scaled, v (B, H, Tk, Dh) — skips the k/v
        projections entirely AND keeps every per-step einsum transpose-free
        (round-2 measurement: per-step cost at B=128 was 4x the K/V
        bandwidth floor because XLA re-materialized transposed K/V each
        step). ``only_kv=True`` computes exactly that pair from ``x`` (the
        memory) for prefill-time caching.

        kv_cache uses the same decode layout: k (B, H, Dh, Tmax) pre-scaled,
        v (B, H, Tmax, Dh).
        """
        D, H = self.n_state, self.n_head
        Dh = D // H
        B = x.shape[0]
        scale = Dh**-0.25
        if only_kv:
            k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k")(x)
            v = nn.Dense(D, dtype=self.dtype, name="v")(x)
            # decode layout, k pre-scaled (matches the q*scale, k*scale
            # split of the non-cached path)
            k = (k.reshape(B, -1, H, Dh) * scale).transpose(0, 2, 3, 1)
            v = v.reshape(B, -1, H, Dh).transpose(0, 2, 1, 3)
            return k, v

        q = nn.Dense(D, dtype=self.dtype, name="q")(x)
        Tq = q.shape[1]
        q = q.reshape(B, Tq, H, Dh)
        decode_layout = kv_cache is not None or xa_kv is not None
        if xa_kv is not None:
            k, v = xa_kv  # decode layout, precomputed at prefill
            if k.dtype != self.dtype:
                # low-precision cross-KV storage (e.g. float8_e4m3fn, the
                # opt-in decode-bandwidth mode): upcast fuses into the
                # per-step read — HBM traffic stays at the storage width
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        else:
            source = x if xa is None else xa
            k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k")(source)
            v = nn.Dense(D, dtype=self.dtype, name="v")(source)
            k = k.reshape(B, -1, H, Dh)
            v = v.reshape(B, -1, H, Dh)

        if kv_cache is not None:
            # new k/v are (B, T, H, Dh) with tiny T — transposing them is
            # cheap; the big cached arrays are never transposed
            ck, cv = kv_cache
            k_new = (k * scale).transpose(0, 2, 3, 1).astype(ck.dtype)  # (B,H,Dh,T)
            v_new = v.transpose(0, 2, 1, 3).astype(cv.dtype)  # (B,H,T,Dh)
            ck = jax.lax.dynamic_update_slice(ck, k_new, (0, 0, 0, cache_index))
            cv = jax.lax.dynamic_update_slice(cv, v_new, (0, 0, cache_index, 0))
            k, v = ck, cv
            new_cache = (ck, cv)
            if ck.dtype != self.dtype:
                # low-precision self-KV storage (float8_e4m3fn, opt-in decode
                # bandwidth mode like the cross-KV path above): the cache
                # LIVES at the storage width (per-step HBM read+write stays
                # f8); the upcast fuses into the attention einsum's read
                k = ck.astype(self.dtype)
                v = cv.astype(self.dtype)
        else:
            new_cache = None

        if (
            self.use_flash
            and mask is None
            and kv_cache is None
            and xa is None
            and xa_kv is None
            and q.shape[1] >= 256
        ):
            from wealy_tpu.ops.flash_attention import flash_mha

            out = flash_mha(q, k, v, Dh**-0.5)
            out = out.reshape(B, Tq, D).astype(self.dtype)
            out = nn.Dense(D, dtype=self.dtype, name="out")(out)
            return out, None

        if decode_layout:
            # k (B,H,Dh,Tk) pre-scaled, v (B,H,Tk,Dh): contraction-minor on
            # both einsums — no per-step transpose of the large cached arrays
            qt = (q * scale).transpose(0, 2, 1, 3)  # (B,H,Tq,Dh) — tiny
            logits = jnp.einsum(
                "bhqd,bhdk->bhqk", qt, k, preferred_element_type=jnp.float32
            )
            if mask is not None:
                logits = logits + mask
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D).astype(self.dtype)
            out = nn.Dense(D, dtype=self.dtype, name="out")(out)
            return out, new_cache

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q * scale,
            k * scale,
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
        out = out.reshape(B, Tq, D).astype(self.dtype)
        out = nn.Dense(D, dtype=self.dtype, name="out")(out)
        return out, new_cache


class _DenseParams(nn.Module):
    """Declares kernel/bias params exactly like nn.Dense (same names, dtypes,
    initializers) and returns them raw — used where a fused kernel needs the
    weights directly while keeping the param tree checkpoint-identical."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return kernel, bias


class ResidualAttentionBlock(nn.Module):
    """Pre-LN attention + MLP block."""

    n_state: int
    n_head: int
    cross_attention: bool = False
    dtype: Any = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        xa=None,
        mask=None,
        kv_cache=None,
        cache_index=None,
        xa_kv=None,
        compute_xa_kv_only: bool = False,
    ):
        if compute_xa_kv_only:
            # prefill-time cross K/V from the encoder memory (x here IS the
            # memory); param names match the normal path ("cross_attn/{k,v}")
            return MultiHeadAttention(
                self.n_state, self.n_head, dtype=self.dtype, name="cross_attn"
            )(x, only_kv=True)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="attn_ln")(x).astype(self.dtype)
        attn_out, new_cache = MultiHeadAttention(
            self.n_state, self.n_head, dtype=self.dtype,
            use_flash=self.use_flash, name="attn"
        )(h, mask=mask, kv_cache=kv_cache, cache_index=cache_index)
        x = x + attn_out

        if self.cross_attention:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="cross_attn_ln")(x).astype(self.dtype)
            cross_out, _ = MultiHeadAttention(
                self.n_state, self.n_head, dtype=self.dtype, name="cross_attn"
            )(h, xa=xa, xa_kv=xa_kv)
            x = x + cross_out

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="mlp_ln")(x).astype(self.dtype)
        # MLP params declared with nn.Dense-identical tree paths
        # ("mlp_fc{1,2}/{kernel,bias}", f32, lecun_normal/zeros) so both code
        # paths below — and every converter/checkpoint — see the same tree.
        w1, b1 = _DenseParams(4 * self.n_state, name="mlp_fc1")(self.n_state)
        w2, b2 = _DenseParams(self.n_state, name="mlp_fc2")(4 * self.n_state)
        if self.use_flash and self.dtype == jnp.bfloat16 and h.shape[1] >= 256:
            # fused Pallas MLP (weights VMEM-resident, no HBM gelu
            # intermediate): +2% at the layer level with the round-2
            # attention (benchmarks/bench_layer_mlp.py). bf16-only: its
            # in-kernel A&S erf approximation (max err 1.5e-7) is far below
            # bf16 noise but would show up in f32 activation-parity runs.
            # Gated on use_flash — like flash_mha, pallas_call has no GSPMD
            # partitioning rule, so TP meshes (which Megatron-shard
            # mlp_fc1/mlp_fc2) must use the XLA path (use_flash=False).
            from wealy_tpu.ops.fused_mlp import fused_mlp

            h = fused_mlp(h, w1.astype(self.dtype), b1, w2.astype(self.dtype), b2)
            return x + h.astype(self.dtype), new_cache
        h = jnp.dot(h, w1.astype(self.dtype)) + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=False)
        h = jnp.dot(h, w2.astype(self.dtype)) + b2.astype(self.dtype)
        return x + h, new_cache


class _ScanDecBody(nn.Module):
    """nn.scan body for the decoder: one cross-attention block per step, with
    optional per-layer KV-cache xs/ys, optional per-layer precomputed cross
    K/V, and optional hidden collection."""

    n_state: int
    n_head: int
    dtype: Any = jnp.bfloat16
    use_cache: bool = False
    use_xa_kv: bool = False
    collect_hiddens: bool = False
    use_flash: bool = True

    @nn.compact
    def __call__(self, carry, xs, audio_states, mask):
        x, cache_index = carry
        ck, cv, xk, xv = xs
        y, new_cache = ResidualAttentionBlock(
            self.n_state,
            self.n_head,
            cross_attention=True,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="block",
        )(
            x,
            xa=audio_states,
            mask=mask,
            kv_cache=(ck, cv) if self.use_cache else None,
            cache_index=cache_index if self.use_cache else None,
            xa_kv=(xk, xv) if self.use_xa_kv else None,
        )
        nk, nv = new_cache if new_cache is not None else (ck, cv)
        hid = y if self.collect_hiddens else jnp.zeros((1,), self.dtype)
        return (y, cache_index), (nk, nv, hid)


class _ScanCrossKvBody(nn.Module):
    """nn.scan body computing each decoder layer's cross-attention K/V from
    the encoder memory (prefill-time cache; param paths match _ScanDecBody)."""

    n_state: int
    n_head: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, _, audio_states):
        kv = ResidualAttentionBlock(
            self.n_state,
            self.n_head,
            cross_attention=True,
            dtype=self.dtype,
            name="block",
        )(audio_states, compute_xa_kv_only=True)
        return carry, kv


class _ScanBlockBody(nn.Module):
    """nn.scan body: one ResidualAttentionBlock applied per carry step."""

    n_state: int
    n_head: int
    dtype: Any = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, carry, _):
        y, _ = ResidualAttentionBlock(
            self.n_state, self.n_head, dtype=self.dtype,
            use_flash=self.use_flash, name="block"
        )(carry)
        return y, None


class WhisperEncoder(nn.Module):
    """Mel (B, n_mels, 3000) -> audio states (B, 1500, D).

    ``scan_layers``: apply the transformer stack as ``nn.scan`` over stacked
    per-layer params ("blocks"/"block"/... with a leading layer axis) instead
    of L unrolled blocks ("block_i"/...). The compiled module then contains
    ONE block body (one Pallas attention payload) regardless of depth —
    required for base+ models through size-limited compile services, and much
    faster to compile for large/32-layer configs. Convert checkpoints with
    ``params_from_*_state_dict(..., scan_layers=True)`` or
    :func:`stack_block_params`.
    """

    config: WhisperConfig
    dtype: Any = jnp.bfloat16
    scan_layers: bool = False
    use_flash: bool = True  # set False under TP meshes (Pallas kernels have
    # no GSPMD partitioning rule; the XLA einsum path partitions by heads)

    @nn.compact
    def __call__(self, mel):
        cfg = self.config
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)  # (B, T, n_mels)
        x = nn.Conv(cfg.n_audio_state, (3,), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            cfg.n_audio_state, (3,), strides=(2,), padding=1, dtype=self.dtype, name="conv2"
        )(x)
        x = nn.gelu(x, approximate=False)  # (B, 1500, D)

        # Positions as a PARAM, not traced transcendentals: params ship as
        # jit arguments (no inlined-constant 413 compile blowups like the old
        # device-computed sinusoid table), the init value is the exact host
        # numpy table, and the converters overwrite it with the checkpoint's
        # stored embed_positions for byte-faithful real-weight parity (TPU
        # exp/sin computed the table ~4e-3 off; numpy matches torch ~1e-7).
        pos = self.param(
            "positions",
            lambda _key, shape: sinusoids(shape[0], shape[1]),
            (cfg.n_audio_ctx, cfg.n_audio_state),
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)

        if self.scan_layers:
            Scan = nn.scan(
                _ScanBlockBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.n_audio_layer,
            )
            x, _ = Scan(
                cfg.n_audio_state, cfg.n_audio_head, dtype=self.dtype,
                use_flash=self.use_flash, name="blocks"
            )(x, None)
        else:
            for i in range(cfg.n_audio_layer):
                x, _ = ResidualAttentionBlock(
                    cfg.n_audio_state, cfg.n_audio_head, dtype=self.dtype,
                    use_flash=self.use_flash, name=f"block_{i}"
                )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x)
        return x.astype(self.dtype)


class WhisperDecoder(nn.Module):
    """Token ids (B, T) + encoder states -> hidden states (B, T, D) and logits.

    With ``kv_caches``/``cache_index`` set, runs one incremental step
    (T == new tokens, usually 1) against cached self-attention keys/values.
    """

    config: WhisperConfig
    dtype: Any = jnp.bfloat16
    scan_layers: bool = False
    use_flash: bool = True  # also gates the fused Pallas MLP (no GSPMD
    # partitioning rule) — set False under TP meshes, like the encoder

    @nn.compact
    def __call__(
        self,
        tokens,
        audio_states,
        kv_caches=None,
        cache_index=None,
        return_all_hiddens: bool = False,
        xa_kv=None,
        compute_cross_kv_only: bool = False,
    ):
        cfg = self.config
        if compute_cross_kv_only:
            # prefill: per-layer cross-attention K/V from the encoder memory
            # (list of (B, Tk, H, Dh) pairs) — pass back in as ``xa_kv`` so
            # decode steps skip the per-step k/v projections
            if self.scan_layers:
                Scan = nn.scan(
                    _ScanCrossKvBody,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=(0, nn.broadcast),
                    out_axes=0,
                    length=cfg.n_text_layer,
                )
                _, (xk, xv) = Scan(
                    cfg.n_text_state, cfg.n_text_head, dtype=self.dtype,
                    name="blocks",
                )(0, jnp.zeros((cfg.n_text_layer, 1), self.dtype), audio_states)
                return [(xk[i], xv[i]) for i in range(cfg.n_text_layer)]
            return [
                ResidualAttentionBlock(
                    cfg.n_text_state,
                    cfg.n_text_head,
                    cross_attention=True,
                    dtype=self.dtype,
                    name=f"block_{i}",
                )(audio_states, compute_xa_kv_only=True)
                for i in range(cfg.n_text_layer)
            ]

        embed = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.n_vocab, cfg.n_text_state),
            jnp.float32,
        )
        pos_embed = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.n_text_ctx, cfg.n_text_state),
            jnp.float32,
        )
        T = tokens.shape[1]
        x = jnp.take(embed, tokens, axis=0).astype(self.dtype)
        offset = 0 if cache_index is None else cache_index
        pos = jax.lax.dynamic_slice_in_dim(pos_embed, offset, T, axis=0)
        x = x + pos[None].astype(self.dtype)

        if cache_index is None:
            causal = jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)
            mask = causal[None, None]
        else:
            # incremental (works for both multi-token prefill and 1-token
            # steps): query t sits at absolute position cache_index + t and
            # may attend to cache positions <= that.
            Tmax = kv_caches[0][0].shape[-1]  # k cache is (B, H, Dh, Tmax)
            q_pos = cache_index + jnp.arange(T)[:, None]
            key_pos = jnp.arange(Tmax)[None, :]
            mask = jnp.where(key_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)[
                None, None
            ]

        new_caches = []
        all_hiddens = [x] if return_all_hiddens else None
        if self.scan_layers:
            Scan = nn.scan(
                _ScanDecBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast, nn.broadcast),
                out_axes=0,
                length=cfg.n_text_layer,
            )
            dummy = jnp.zeros((cfg.n_text_layer, 1), self.dtype)
            if kv_caches is None:
                # dummy stacked cache input so the scan body signature is
                # uniform; the body ignores it when use_cache=False
                xs_cache = (dummy, dummy)
                use_cache = False
            else:
                xs_cache = (
                    jnp.stack([c[0] for c in kv_caches]),
                    jnp.stack([c[1] for c in kv_caches]),
                )
                use_cache = True
            if xa_kv is None:
                xs_xa = (dummy, dummy)
                use_xa_kv = False
            else:
                xs_xa = (
                    jnp.stack([c[0] for c in xa_kv]),
                    jnp.stack([c[1] for c in xa_kv]),
                )
                use_xa_kv = True
            xs = (*xs_cache, *xs_xa)
            ci = jnp.asarray(0 if cache_index is None else cache_index, jnp.int32)
            (x, _), ys = Scan(
                cfg.n_text_state,
                cfg.n_text_head,
                dtype=self.dtype,
                use_cache=use_cache,
                use_xa_kv=use_xa_kv,
                collect_hiddens=return_all_hiddens,
                use_flash=self.use_flash,
                name="blocks",
            )((x, ci), xs, audio_states, mask)
            new_k, new_v, hid_stack = ys[0], ys[1], ys[2]
            if use_cache:
                new_caches = [
                    (new_k[i], new_v[i]) for i in range(cfg.n_text_layer)
                ]
            if return_all_hiddens:
                all_hiddens = [all_hiddens[0]] + [
                    hid_stack[i] for i in range(cfg.n_text_layer)
                ]
        else:
            for i in range(cfg.n_text_layer):
                cache_i = None if kv_caches is None else kv_caches[i]
                x, new_cache = ResidualAttentionBlock(
                    cfg.n_text_state,
                    cfg.n_text_head,
                    cross_attention=True,
                    dtype=self.dtype,
                    use_flash=self.use_flash,
                    name=f"block_{i}",
                )(
                    x,
                    xa=audio_states,
                    mask=mask,
                    kv_cache=cache_i,
                    cache_index=cache_index,
                    xa_kv=None if xa_kv is None else xa_kv[i],
                )
                new_caches.append(new_cache)
                if return_all_hiddens:
                    all_hiddens.append(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)
        if kv_caches is not None:
            # incremental decode: bf16 logits matmul with f32 accumulation —
            # halves the per-step read of the (n_vocab, D) embedding and runs
            # at the bf16 MXU rate; argmax/sampling is insensitive to the
            # bf16 input rounding. Teacher-forced (cache-less) logits stay
            # f32 for activation-parity work.
            logits = jnp.einsum(
                "btd,vd->btv",
                x.astype(self.dtype),
                embed.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            logits = jnp.einsum(
                "btd,vd->btv", x, embed, preferred_element_type=jnp.float32
            )
        hidden = x.astype(self.dtype)
        extras = []
        if return_all_hiddens:
            # (n_layers + 1, B, T, D): token+pos embedding output followed by
            # each block's output (the "hidden_states / hs_all" taxonomy entry)
            extras.append(jnp.stack(all_hiddens).astype(self.dtype))
        if kv_caches is None:
            return (hidden, logits, *extras) if extras else (hidden, logits)
        return (hidden, logits, new_caches, *extras)


class Whisper(nn.Module):
    """Full encoder-decoder; ``method=`` entry points for each half."""

    config: WhisperConfig
    dtype: Any = jnp.bfloat16
    scan_layers: bool = False
    use_flash: bool = True

    def setup(self):
        self.encoder = WhisperEncoder(
            self.config, dtype=self.dtype, scan_layers=self.scan_layers,
            use_flash=self.use_flash,
        )
        self.decoder = WhisperDecoder(
            self.config, dtype=self.dtype, scan_layers=self.scan_layers,
            use_flash=self.use_flash,
        )

    def __call__(self, mel, tokens):
        audio_states = self.encoder(mel)
        return self.decoder(tokens, audio_states)

    def encode(self, mel):
        return self.encoder(mel)

    def decode(
        self,
        tokens,
        audio_states,
        kv_caches=None,
        cache_index=None,
        return_all_hiddens: bool = False,
        xa_kv=None,
    ):
        return self.decoder(
            tokens,
            audio_states,
            kv_caches=kv_caches,
            cache_index=cache_index,
            return_all_hiddens=return_all_hiddens,
            xa_kv=xa_kv,
        )

    def precompute_cross_kv(self, audio_states):
        """Per-layer cross-attention (k, v) pairs from encoder states —
        compute once at prefill and pass to every ``decode`` call via
        ``xa_kv`` (the memory never changes across decode steps)."""
        return self.decoder(None, audio_states, compute_cross_kv_only=True)
