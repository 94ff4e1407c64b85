"""Greedy decoding with a static-shape KV cache under ``lax.while_loop``.

This is the extraction path for the decoder-embedding taxonomy
(``hs_last_seq`` / ``hs_last_all`` — reference file names at
lib/embedding_dataset/base_dataset.py:99-126): transcribe each 30 s chunk
greedily and collect the decoder's last-hidden-state vector for every
generated token. Entirely on-device: static buffers of length ``max_len``,
early exit when every sequence has emitted <|endoftext|>.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from wealy_tpu.models.whisper.config import WhisperConfig
from wealy_tpu.models.whisper.model import Whisper


def default_prompt(config: WhisperConfig, language: Optional[int] = None) -> list[int]:
    """<|startoftranscript|> [<|lang|> <|transcribe|>] <|notimestamps|>.

    ``language=None`` omits the language/task tokens (model auto-detects on
    the first generated token); ``language=0`` forces English — the ``_en``
    embedding variants of the reference taxonomy.
    """
    toks = [config.sot]
    if language is not None:
        toks += [config.language_token(language), config.token_transcribe]
    toks.append(config.token_no_timestamps)
    return toks


def default_suppress_tokens(config: WhisperConfig, tokenizer=None) -> list[int]:
    """openai-whisper's default ``suppress_tokens="-1"`` list: the task /
    prompt special tokens are never valid generations, and (with a tokenizer
    to map them) the non-speech symbol tokens — brackets, quote runs, ♪ —
    that the model otherwise emits over music (whisper/tokenizer.py
    ``non_speech_tokens`` in the upstream pip package; NOT part of
    /root/reference, which ships no decoding code). The reference's
    transcription trees were produced under this default, so the census
    heuristics (data/transcription.py) see the same symbol distribution.
    """
    ids = {
        config.sot,
        config.token_translate,
        config.token_transcribe,
        config.token_startoflm,
        config.token_startofprev,
        config.token_nospeech,
    }
    if tokenizer is not None:
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
        symbols += (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] "
            "{{ }} ♪♪ ♪♪♪".split()
        )
        miscellaneous = set("♩♪♫♬♭♮♯")
        for text in (" -", " '"):
            enc = tokenizer.encode(text)
            if enc:
                ids.add(enc[0])
        for symbol in symbols + list(miscellaneous):
            for enc in (tokenizer.encode(symbol),
                        tokenizer.encode(" " + symbol)):
                if len(enc) == 1 or symbol in miscellaneous:
                    if enc:
                        ids.add(enc[0])
    return sorted(t for t in ids if t < config.n_vocab)


def init_kv_caches(config: WhisperConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """Self-attention KV caches in DECODE layout: k (B, H, Dh, Tmax)
    pre-scaled, v (B, H, Tmax, Dh) — contraction-minor for both attention
    einsums, so per-step reads of the big cached arrays are transpose-free
    (the round-2 decoder-throughput fix)."""
    H = config.n_text_head
    Dh = config.n_text_state // H
    return [
        (
            jnp.zeros((batch, H, Dh, max_len), dtype),
            jnp.zeros((batch, H, max_len, Dh), dtype),
        )
        for _ in range(config.n_text_layer)
    ]


def detect_language(model: Whisper, params, audio_states, config: WhisperConfig):
    """Whisper language identification: one decoder step from <|sot|>, logits
    restricted to the config's language-token block.

    Returns (lang_index (B,) int32 — 0 is English, feed to
    ``config.language_token`` / ``default_prompt(language=...)`` — and the
    (B, n_languages) log-probabilities).
    """
    B = audio_states.shape[0]
    sot = jnp.full((B, 1), config.sot, dtype=jnp.int32)
    _, logits = model.apply(
        {"params": params}, sot, audio_states, method=Whisper.decode
    )
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], config.language_token(0), config.n_languages, axis=-1
    )
    logp = jax.nn.log_softmax(lang_logits, axis=-1)
    return jnp.argmax(logp, axis=-1).astype(jnp.int32), logp


def greedy_decode(
    model: Whisper,
    params,
    audio_states,
    config: WhisperConfig,
    prompt: Sequence[int],
    max_len: int = 224,
    suppress_tokens: Optional[Sequence[int]] = None,
    eot: Optional[int] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    cross_kv_dtype=None,
    self_kv_dtype=None,
    xa_kv=None,
):
    """Decode from encoder states: greedy at ``temperature=0`` (default),
    categorical sampling otherwise (the long-form fallback ladder's sampled
    retries — see :mod:`wealy_tpu.models.whisper.longform`).

    ``xa_kv``: precomputed cross-attention K/V (Whisper.precompute_cross_kv
    output) — pass when decoding the same audio several times (the long-form
    temperature-fallback ladder) to skip recomputing it per attempt.

    ``cross_kv_dtype``: optional storage dtype for the precomputed
    cross-attention K/V (e.g. ``jnp.float8_e4m3fn``). Decode steps are
    bandwidth-bound on re-reading cross K/V; f8 storage cuts the B=128
    per-step cost 28% at ~1.4% hidden-state perturbation / 0.5% greedy token
    flips (measured teacher-forced) — opt-in for throughput-critical
    extraction, default full-precision.

    ``self_kv_dtype``: same storage trick for the SELF-attention caches
    (written incrementally each step, re-read every step): the cache lives
    in f8 end to end, halving its per-step HBM traffic vs bf16. Quantization
    error here feeds back through the token trajectory (unlike the constant
    cross memory) — see BENCH_NOTES round 3 for measured perturbation.

    Returns dict with:
      - ``tokens``  (B, max_len) int32 — prompt + generated, eot-padded
      - ``lengths`` (B,) int32 — number of valid positions (incl. prompt)
      - ``hidden``  (B, max_len, D) — decoder last hidden state per position
      - ``sum_logprob`` (B,) f32 — Σ log p(chosen token) over generated
        tokens incl. the closing eot (the long-form avg_logprob numerator)
      - ``nospeech_prob`` (B,) f32 — p(<|nospeech|>) at the <|sot|> position
        (voice-activity gate of the long-form algorithm)
    """
    B = audio_states.shape[0]
    P = len(prompt)
    assert 0 < P < max_len
    if eot is None:
        eot = config.eot

    tokens = jnp.full((B, max_len), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :P].set(jnp.asarray(list(prompt), dtype=jnp.int32))
    hidden_buf = jnp.zeros((B, max_len, config.n_text_state), model.dtype)
    caches = init_kv_caches(
        config, B, max_len, dtype=self_kv_dtype or model.dtype
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # constant (V,) boolean mask + where instead of a scatter: the .at[].set
    # form de-fuses the bf16 logits einsum on some backends (XLA:CPU's
    # DotThunk rejects BF16xBF16=F32 once unfused) and a where is cheaper
    if suppress_tokens is not None and len(suppress_tokens) > 0:
        import numpy as _np

        _m = _np.zeros((config.n_vocab,), bool)
        _m[_np.asarray(list(suppress_tokens), _np.int64)] = True
        suppress_mask = jnp.asarray(_m)
    else:
        suppress_mask = None

    def _mask_logits(logits):
        if suppress_mask is None:
            return logits
        return jnp.where(suppress_mask[None, :], -jnp.inf, logits)

    def _choose(logits, step_key):
        """(B, V) masked logits -> (next_token, logprob of it)."""
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if temperature == 0.0:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(step_key, logits.astype(jnp.float32) / temperature)
            nxt = nxt.astype(jnp.int32)
        return nxt, jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]

    # Cross-attention K/V once (the memory is constant across steps; without
    # this, every step re-projects 1500 encoder frames per layer — it
    # dominated the round-1 decoder extraction cost).
    if xa_kv is None:
        xa_kv = model.apply(
            {"params": params}, audio_states, method=Whisper.precompute_cross_kv
        )
    if cross_kv_dtype is not None:
        xa_kv = [(k.astype(cross_kv_dtype), v.astype(cross_kv_dtype)) for k, v in xa_kv]

    # Prefill the prompt (cache positions [0, P)).
    hid, logits, caches = model.apply(
        {"params": params},
        tokens[:, :P],
        audio_states,
        kv_caches=caches,
        cache_index=0,
        xa_kv=xa_kv,
        method=Whisper.decode,
    )
    hidden_buf = lax.dynamic_update_slice(hidden_buf, hid.astype(model.dtype), (0, 0, 0))
    # voice-activity signal: p(<|nospeech|>) at the <|sot|> position —
    # openai-whisper's no_speech_prob. With long-form context carry-over the
    # prompt is [<|startofprev|>, ctx..., <|sot|>, ...], so sot is NOT at
    # index 0; find it in the prompt (static python ints).
    _pl = list(prompt)
    # LAST occurrence: a sampled <|sot|> can leak into the carried-context
    # tail; the real sot always sits just before the task tokens at the end
    sot_index = (len(_pl) - 1 - _pl[::-1].index(config.sot)) if config.sot in _pl else 0
    sot_logp = jax.nn.log_softmax(logits[:, sot_index].astype(jnp.float32), axis=-1)
    nospeech_prob = jnp.exp(sot_logp[:, config.token_nospeech])

    next_tok, logp0 = _choose(_mask_logits(logits[:, -1]), jax.random.fold_in(rng, P))
    tokens = tokens.at[:, P].set(next_tok)
    finished0 = next_tok == eot
    sum_logprob0 = logp0  # first generated token always counts

    def cond(state):
        i, _, _, _, finished, _ = state
        return (i < max_len - 1) & jnp.logical_not(jnp.all(finished))

    def body(state):
        i, tokens, hidden_buf, caches, finished, sum_logprob = state
        tok = lax.dynamic_slice(tokens, (0, i), (B, 1))
        hid, logits, caches = model.apply(
            {"params": params},
            tok,
            audio_states,
            kv_caches=caches,
            cache_index=i,
            xa_kv=xa_kv,
            method=Whisper.decode,
        )
        hidden_buf = lax.dynamic_update_slice(
            hidden_buf, hid.astype(model.dtype), (0, i, 0)
        )
        nxt, logp = _choose(_mask_logits(logits[:, -1]), jax.random.fold_in(rng, i + 1))
        nxt = jnp.where(finished, eot, nxt)
        sum_logprob = sum_logprob + jnp.where(finished, 0.0, logp)
        tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        return (i + 1, tokens, hidden_buf, caches, finished | (nxt == eot), sum_logprob)

    state = (jnp.int32(P), tokens, hidden_buf, caches, finished0, sum_logprob0)
    _, tokens, hidden_buf, _, _, sum_logprob = lax.while_loop(cond, body, state)

    # lengths: prompt + generated tokens before the first eot
    pos = jnp.arange(max_len)[None, :]
    is_eot = (tokens == eot) & (pos >= P)
    has_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(has_eot, first_eot, max_len).astype(jnp.int32)
    return {
        "tokens": tokens,
        "lengths": lengths,
        "hidden": hidden_buf,
        "sum_logprob": sum_logprob,
        "nospeech_prob": nospeech_prob,
    }
