"""Batched beam-search decoding with static shapes and a flattened beam axis.

The reference's transcription trees were produced by openai-whisper's
``transcribe()`` (SURVEY.md §2.1, lib/audio_dataset/cache.py:46-90 consumes
them), whose ``DecodingOptions.beam_size`` selects beam search on the
temperature-0 rung of the long-form fallback ladder. This module is the
TPU-native equivalent of openai-whisper's ``BeamSearchDecoder`` +
``MaximumLikelihoodRanker`` (whisper/decoding.py in the upstream pip
package — NOT part of /root/reference, which ships no decoding code):

- Beams ride the batch axis: all state is shaped ``(B*K, ...)`` so every
  decode step is ONE fixed-shape dispatch on the MXU — no per-beam Python,
  no ragged shapes, one compile per (B, K, max_len) signature.
- Prefill runs at ``B`` (the prompt is beam-independent), then the KV caches
  tile K× — the K-fold prefill FLOPs are never paid.
- Each step: ``log_softmax`` over the step logits, finished beams are locked
  to an eot-only continuation at zero cost (their cumulative score freezes),
  candidates score as ``sum_logprob[b,k] + logp[b,k,v]`` and the top-K of
  the ``(K*V)`` flat candidates per batch element are kept via
  ``lax.top_k``. The KV caches then gather along the beam axis (``jnp.take``
  of the flat ``(B*K)`` index) — the standard beam-reorder.
- Token and hidden-state buffers are NOT physically reordered (round-4
  BENCH_NOTES measured the per-step reorder traffic scaling with Tmax —
  8.8x greedy at max_len=224 vs the ideal 5x at K=5). Instead each step
  records its per-slot ancestry (``src_trace``) and chosen token
  (``tok_trace``), hidden states are written in pre-reorder slot order,
  and ONE reverse-scan backtrack after the loop reconstructs every beam's
  token/hidden path — turning max_len full-buffer gathers into one.
- Ranking matches openai-whisper's MaximumLikelihoodRanker: cumulative
  log-prob divided by generated length (``length_penalty=None``) or by the
  GPT-style penalty ``((5 + n) / 6) ** length_penalty``.

Deviation from openai-whisper, documented: upstream's BeamSearchDecoder
removes finished hypotheses into a side list and keeps expanding until
``patience * beam_size`` are collected; here finished beams stay in the
active set as frozen eot-extensions that live candidates must out-score —
the common "in-beam" formulation (exactly upstream's behavior at the
default ``patience=1.0`` whenever the K survivors are the K best finished
hypotheses, which greedy-dominant audio chunks satisfy in practice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from wealy_tpu.models.whisper.config import WhisperConfig
from wealy_tpu.models.whisper.generate import init_kv_caches
from wealy_tpu.models.whisper.model import Whisper


def rank_beams(sum_logprob, n_gen, length_penalty: Optional[float] = None):
    """openai-whisper MaximumLikelihoodRanker: score each hypothesis by
    cumulative log-prob over a length penalty. ``n_gen`` counts generated
    tokens including the closing eot (greedy_decode's sum_logprob
    convention)."""
    n = jnp.maximum(n_gen.astype(jnp.float32), 1.0)
    if length_penalty is None:
        penalty = n
    else:
        penalty = ((5.0 + n) / 6.0) ** length_penalty
    return sum_logprob / penalty


def beam_decode(
    model: Whisper,
    params,
    audio_states,
    config: WhisperConfig,
    prompt: Sequence[int],
    beam_size: int = 5,
    max_len: int = 224,
    suppress_tokens: Optional[Sequence[int]] = None,
    eot: Optional[int] = None,
    length_penalty: Optional[float] = None,
    cross_kv_dtype=None,
    self_kv_dtype=None,
    xa_kv=None,
    return_beams: bool = False,
):
    """Beam-search decode from encoder states ``(B, T_audio, D)``.

    Same contract as :func:`wealy_tpu.models.whisper.generate.greedy_decode`
    (which is the ``beam_size=1`` special case of this schedule): returns
    dict with the BEST hypothesis per batch element —

      - ``tokens``  (B, max_len) int32 — prompt + generated, eot-padded
      - ``lengths`` (B,) int32 — valid positions (incl. prompt)
      - ``hidden``  (B, max_len, D) — decoder last hidden state along the
        winning beam's path (prefix positions follow the beam's own history,
        so extraction taxonomies read the embedding of what was decoded)
      - ``sum_logprob`` (B,) f32 — Σ log p over generated tokens incl. eot
      - ``nospeech_prob`` (B,) f32 — p(<|nospeech|>) at <|sot|> (beam-
        independent: read from the shared prefill)

    and, with ``return_beams=True``, the full beam sets ``beam_tokens``
    (B, K, max_len), ``beam_lengths`` (B, K), ``beam_sum_logprob`` (B, K)
    ranked best-first.

    ``xa_kv`` may be precomputed at batch ``B`` (longform ladder reuse) or
    ``B*K``; ``B``-shaped inputs tile internally.
    """
    B = audio_states.shape[0]
    K = int(beam_size)
    P = len(prompt)
    assert 0 < P < max_len
    assert K >= 1
    if eot is None:
        eot = config.eot
    BK = B * K

    # constant-mask + where, not .at[].set — see generate.py: the scatter
    # form de-fuses the bf16 logits einsum on XLA:CPU
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

    # ---- prefill at B (prompt is identical across beams) -------------------
    if xa_kv is None:
        xa_kv = model.apply(
            {"params": params}, audio_states, method=Whisper.precompute_cross_kv
        )
    if cross_kv_dtype is not None:
        xa_kv = [(k.astype(cross_kv_dtype), v.astype(cross_kv_dtype))
                 for k, v in xa_kv]

    prompt_arr = jnp.asarray(list(prompt), dtype=jnp.int32)
    caches_b = init_kv_caches(
        config, B, max_len, dtype=self_kv_dtype or model.dtype
    )
    hid, logits, caches_b = model.apply(
        {"params": params},
        jnp.broadcast_to(prompt_arr[None], (B, P)),
        audio_states,
        kv_caches=caches_b,
        cache_index=0,
        xa_kv=xa_kv,
        method=Whisper.decode,
    )

    # voice-activity signal at the <|sot|> position (see greedy_decode; the
    # LAST sot handles carried-context prompts that contain a sampled sot)
    _pl = list(prompt)
    sot_index = (
        (len(_pl) - 1 - _pl[::-1].index(config.sot)) if config.sot in _pl else 0
    )
    sot_logp = jax.nn.log_softmax(logits[:, sot_index].astype(jnp.float32), -1)
    nospeech_prob = jnp.exp(sot_logp[:, config.token_nospeech])

    # first generated token: top-K of the (B, V) prefill logits seeds K
    # DISTINCT beams per batch element (no duplicate-beam masking needed)
    logp0 = jax.nn.log_softmax(
        _mask_logits(logits[:, -1]).astype(jnp.float32), axis=-1
    )
    sum_logprob, tok0 = lax.top_k(logp0, K)            # (B, K) both
    finished = tok0 == eot                              # (B, K)

    # ---- tile prefill state K x into the flat (B*K) beam-batch -------------
    def _tile(a):
        return jnp.repeat(a, K, axis=0)

    caches = [(_tile(k), _tile(v)) for k, v in caches_b]
    if xa_kv is not None and xa_kv[0][0].shape[0] == B and K > 1:
        xa_kv = [(_tile(k), _tile(v)) for k, v in xa_kv]
    audio_bk = _tile(audio_states)

    # trace+backtrack state: tokens/hidden are reconstructed AFTER the loop
    # from per-step ancestry instead of being gathered every step.
    # tok_trace[j] = token at position j per (batch, slot); src_trace[j] =
    # the slot each position-j slot descended from (identity beyond the
    # last executed step, so backtracking through early-exit padding is a
    # no-op and the padded eot rows read through unchanged).
    ident = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None], (B, K)
    )
    tok_trace = jnp.full((max_len, B, K), eot, dtype=jnp.int32)
    tok_trace = tok_trace.at[:P].set(
        jnp.broadcast_to(prompt_arr[:, None, None], (P, B, K))
    )
    tok_trace = tok_trace.at[P].set(tok0)
    src_trace = jnp.broadcast_to(ident[None], (max_len, B, K))
    cur_tok = tok0.reshape(BK, 1)
    hidden_buf = jnp.zeros((BK, max_len, config.n_text_state), model.dtype)
    hidden_buf = lax.dynamic_update_slice(
        hidden_buf, _tile(hid.astype(model.dtype)), (0, 0, 0)
    )

    V = logits.shape[-1]
    batch_base = (jnp.arange(B, dtype=jnp.int32) * K)[:, None]  # (B, 1)
    neg_inf = jnp.float32(-jnp.inf)

    def cond(state):
        i = state[0]
        finished = state[5]
        return (i < max_len - 1) & jnp.logical_not(jnp.all(finished))

    def body(state):
        (i, cur_tok, hidden_buf, caches, tok_trace, finished, sum_logprob,
         src_trace) = state
        hid, logits, caches = model.apply(
            {"params": params},
            cur_tok,
            audio_bk,
            kv_caches=caches,
            cache_index=i,
            xa_kv=xa_kv,
            method=Whisper.decode,
        )
        # written in PRE-reorder slot order; the backtrack resolves which
        # slot held each position of the winning path
        hidden_buf = lax.dynamic_update_slice(
            hidden_buf, hid.astype(model.dtype), (0, i, 0)
        )
        logp = jax.nn.log_softmax(
            _mask_logits(logits[:, -1]).astype(jnp.float32), axis=-1
        )  # (BK, V)
        # finished beams: eot-only continuation at zero cost — the frozen
        # hypothesis competes in the top-K on its final cumulative score
        fin_flat = finished.reshape(BK)
        locked = jnp.full((BK, V), neg_inf).at[:, eot].set(0.0)
        logp = jnp.where(fin_flat[:, None], locked, logp)

        cand = sum_logprob.reshape(BK, 1) + logp          # (BK, V)
        cand = cand.reshape(B, K * V)
        new_sum, flat_idx = lax.top_k(cand, K)            # (B, K)
        src_beam = (flat_idx // V).astype(jnp.int32)      # (B, K) in [0, K)
        new_tok = (flat_idx % V).astype(jnp.int32)        # (B, K)

        # beam reorder: only the KV caches (attention must read the full
        # surviving prefix per slot) and the tiny per-beam scalars gather;
        # token/hidden history is reconstructed from the traces afterwards
        src = (batch_base + src_beam).reshape(BK)         # (BK,) int32
        caches = [
            (jnp.take(k, src, axis=0), jnp.take(v, src, axis=0))
            for k, v in caches
        ]
        finished = jnp.take(finished.reshape(BK), src).reshape(B, K)
        finished = finished | (new_tok == eot)
        tok_trace = lax.dynamic_update_slice(
            tok_trace, new_tok[None], (i + 1, 0, 0)
        )
        src_trace = lax.dynamic_update_slice(
            src_trace, src_beam[None], (i + 1, 0, 0)
        )
        return (i + 1, new_tok.reshape(BK, 1), hidden_buf, caches,
                tok_trace, finished, new_sum, src_trace)

    state = (jnp.int32(P), cur_tok, hidden_buf, caches, tok_trace, finished,
             sum_logprob, src_trace)
    (_, _, hidden_buf, _, tok_trace, _, sum_logprob, src_trace) = (
        lax.while_loop(cond, body, state)
    )

    # ---- backtrack: ancestry -> per-beam token/hidden paths ---------------
    # One reverse scan over positions replaces the per-step full-buffer
    # gathers: anc[j] = the slot that held position j of each FINAL beam.
    def back(a, xs):
        tok_j, src_j = xs                                  # (B, K) rows
        tok = jnp.take_along_axis(tok_j, a, axis=1)        # token at j
        a_prev = jnp.take_along_axis(src_j, a, axis=1)     # ancestor for <j
        return a_prev, (tok, a)

    _, (toks_rev, anc_rev) = lax.scan(
        back, ident, (tok_trace[::-1], src_trace[::-1])
    )
    tokens = toks_rev[::-1].transpose(1, 2, 0).reshape(BK, max_len)
    anc = anc_rev[::-1].transpose(1, 2, 0)                 # (B, K, max_len)
    hidden_buf = jnp.take_along_axis(
        hidden_buf.reshape(B, K, max_len, -1), anc[..., None], axis=1
    ).reshape(BK, max_len, -1)

    # per-beam lengths (prompt + generated before the first eot)
    pos = jnp.arange(max_len)[None, :]
    is_eot = (tokens == eot) & (pos >= P)
    has_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(has_eot, first_eot, max_len).astype(jnp.int32)  # (BK,)

    # final ranking: length-penalized cumulative log-prob, openai-whisper's
    # MaximumLikelihoodRanker (+1 counts the closing eot, whose log-prob is
    # in sum_logprob — the longform avg_logprob convention)
    n_gen = lengths.reshape(B, K) - P + 1
    score = rank_beams(sum_logprob, n_gen, length_penalty)  # (B, K)
    order = jnp.argsort(-score, axis=1)                     # best-first
    best = (batch_base[:, 0] + order[:, 0]).astype(jnp.int32)  # (B,)

    out = {
        "tokens": jnp.take(tokens, best, axis=0),
        "lengths": jnp.take(lengths, best, axis=0),
        "hidden": jnp.take(hidden_buf, best, axis=0),
        "sum_logprob": jnp.take(sum_logprob.reshape(BK), best),
        "nospeech_prob": nospeech_prob,
    }
    if return_beams:
        perm = (batch_base + order).reshape(BK)
        out["beam_tokens"] = jnp.take(tokens, perm, axis=0).reshape(
            B, K, max_len
        )
        out["beam_lengths"] = jnp.take(lengths, perm).reshape(B, K)
        out["beam_sum_logprob"] = jnp.take(
            sum_logprob.reshape(BK), perm
        ).reshape(B, K)
    return out
