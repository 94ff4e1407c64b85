"""Sequential long-form transcription: context carry-over + temperature
fallback + compression-ratio gating.

The reference's transcription trees (consumed at
lib/audio_dataset/cache.py:46-90, produced by Whisper sets like
``turbo_nothing_whisper_42``, lib/audio_dataset/dataset.py:17-19) come from
Whisper's published long-form algorithm, which decodes 30 s chunks
SEQUENTIALLY: each chunk's prompt is ``<|startofprev|>`` + the tail of the
previously transcribed text, and each chunk retries through a temperature
ladder whenever the output is degenerate (zlib compression ratio above 2.4 —
looping text — or mean token log-probability below −1.0), with a
voice-activity skip when p(<|nospeech|>) is high. Greedy-per-chunk decoding
(the round-1 transcribe CLI) produces a different text census on full songs;
this module restores the reference-faithful behavior.

TPU-shaped details:
- context lengths snap to a small bucket set so each (prompt_len,
  temperature) pair compiles once and is reused across all chunks/songs;
- each temperature rung is its own compiled program (the ladder is ≤6 wide);
- when no tokenizer is available, the compression-ratio gate runs over the
  token-id byte stream instead of text — repetition shows up identically
  (documented deviation; pass ``decode_text`` for byte-exact parity).
"""

from __future__ import annotations

import zlib
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from wealy_tpu.models.whisper.config import WhisperConfig
from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode
from wealy_tpu.models.whisper.model import Whisper

# context-tail buckets: bounded compile count, longest useful context 128
CTX_BUCKETS = (0, 8, 16, 32, 64, 128)


def compression_ratio(data: bytes) -> float:
    """len(raw) / len(zlib(raw)) — high for degenerately repetitive output
    (openai-whisper's gating statistic)."""
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _ctx_bucket(n: int) -> int:
    best = 0
    for b in CTX_BUCKETS:
        if b <= n:
            best = b
    return best


def transcribe_longform(
    model: Whisper,
    params,
    audio_states,
    config: WhisperConfig,
    *,
    language: Optional[int] = 0,
    max_len: int = 224,
    temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    best_of: int = 5,
    beam_size: Optional[int] = None,
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    decode_text: Optional[Callable[[Sequence[int]], str]] = None,
    seed: int = 0,
    suppress_tokens: Optional[Sequence[int]] = "default",
    initial_prompt_tokens: Optional[Sequence[int]] = None,
) -> dict:
    """Transcribe one song's encoder states (n_chunks, ctx, d) sequentially.

    ``best_of``: number of independent candidates sampled per t>0 rung, the
    winner picked by length-normalized summed log-probability (openai-
    whisper's ``best_of=5`` + MaximumLikelihoodRanker with
    ``length_penalty=None``). The t=0 rung is deterministic greedy, so it
    always decodes a single candidate. The candidates run as ONE batched
    decode reusing the chunk's precomputed cross-attention K/V, and the
    batch amortizes the per-step parameter reads that dominate small-batch
    decode cost (candidate K/V re-reads do scale with ``best_of``).

    ``beam_size``: when set (>1), the t=0 rung runs BEAM SEARCH instead of
    greedy — openai-whisper's ``DecodingOptions.beam_size`` semantics (beam
    search on the deterministic rung, ``best_of`` sampling on the t>0
    rescue rungs). The beams ride one batched decode like the best_of
    candidates (wealy_tpu.models.whisper.beam).

    ``suppress_tokens``: token ids never sampled. The default sentinel
    ``"default"`` applies openai-whisper's ``suppress_tokens="-1"`` special
    set (generate.default_suppress_tokens; pass the tokenizer-extended list
    for the non-speech symbols too); ``None``/``()`` disables suppression.

    ``initial_prompt_tokens``: openai-whisper's ``initial_prompt`` —
    pre-seeds the <|startofprev|> context for the FIRST chunk (encode the
    text with a leading space); it then ages out of the rolling context
    window like any transcribed text and is dropped on a high-temperature
    context reset.

    Returns dict with:
      - ``chunk_tokens``: list of per-chunk generated token-id lists
        (skipped/no-speech chunks are empty)
      - ``segments``: per-chunk metadata dicts (temperature used,
        avg_logprob, compression_ratio, no_speech_prob, context_len,
        skipped)
      - ``text``: joined text when ``decode_text`` is provided, else None
    """
    n_chunks = audio_states.shape[0]
    base_prompt = default_prompt(config, language=language)
    rng = jax.random.PRNGKey(seed)
    if isinstance(suppress_tokens, str) and suppress_tokens == "default":
        from wealy_tpu.models.whisper.generate import default_suppress_tokens

        suppress_tokens = default_suppress_tokens(config)
    suppress_tokens = list(suppress_tokens or ())

    context: list[int] = list(initial_prompt_tokens or ())
    min_bucket = min(b for b in CTX_BUCKETS if b > 0)
    if context and len(context) < min_bucket:
        # context lengths snap DOWN to the bucket set (compile-count bound),
        # which would silently drop a short initial prompt; cyclic-pad it to
        # the smallest bucket so the hint survives with static shapes
        reps = -(-min_bucket // len(context))
        context = (context * reps)[-min_bucket:]
    chunk_tokens: list[list[int]] = []
    segments: list[dict] = []

    for c in range(n_chunks):
        states = audio_states[c : c + 1]
        # cross-attention K/V depend only on the audio: compute once per
        # chunk, shared across every temperature-fallback attempt
        chunk_xa_kv = model.apply(
            {"params": params}, states, method=Whisper.precompute_cross_kv
        )
        k = _ctx_bucket(len(context))
        ctx_tail = context[-k:] if k else []
        prompt = (
            ([config.token_startofprev] + ctx_tail) if ctx_tail else []
        ) + base_prompt

        # generation budget is max_len NEW tokens regardless of how much
        # carried context pads the prompt (openai-whisper sample_len
        # semantics); the KV buffer caps at the decoder's trained context
        total_len = min(config.n_text_ctx, len(prompt) + max_len)
        chosen = None
        for t in temperatures:
            # t=0 is deterministic — greedy, or beam search when beam_size
            # is set (openai-whisper's beam_size rung semantics); sampled
            # rungs draw `best_of` independent candidates as one batched
            # decode
            use_beam = t == 0.0 and beam_size is not None and beam_size > 1
            n_cand = 1 if t == 0.0 else max(1, int(best_of))
            if n_cand > 1:
                states_t = jnp.broadcast_to(
                    states, (n_cand,) + states.shape[1:]
                )
                xa_kv_t = jax.tree.map(
                    lambda a: jnp.broadcast_to(a, (n_cand,) + a.shape[1:]),
                    chunk_xa_kv,
                )
            else:
                states_t, xa_kv_t = states, chunk_xa_kv
            if use_beam:
                from wealy_tpu.models.whisper.beam import beam_decode

                out = beam_decode(
                    model,
                    params,
                    states_t,
                    config,
                    prompt=prompt,
                    beam_size=int(beam_size),
                    max_len=total_len,
                    suppress_tokens=suppress_tokens,
                    xa_kv=xa_kv_t,
                )
            else:
                out = greedy_decode(
                    model,
                    params,
                    states_t,
                    config,
                    prompt=prompt,
                    max_len=total_len,
                    suppress_tokens=suppress_tokens,
                    temperature=float(t),
                    rng=jax.random.fold_in(rng, c * 101 + int(t * 10)),
                    xa_kv=xa_kv_t,
                )
            lengths_np = np.asarray(out["lengths"])
            sumlp_np = np.asarray(out["sum_logprob"], np.float32)
            # candidate ranking: summed logprob / token count — openai-
            # whisper's MaximumLikelihoodRanker with length_penalty=None
            n_gen_all = np.maximum(lengths_np - len(prompt), 1)
            best = int(np.argmax(sumlp_np / n_gen_all)) if n_cand > 1 else 0
            length = int(lengths_np[best])
            gen = np.asarray(out["tokens"])[best, len(prompt) : length].tolist()
            n_gen = max(length - len(prompt), 0)
            avg_logprob = float(sumlp_np[best]) / (n_gen + 1)
            if decode_text is not None:
                payload = decode_text(gen).encode("utf-8")
            else:
                payload = np.asarray(gen, np.int32).tobytes()
            ratio = compression_ratio(payload)

            needs_fallback = False
            if compression_ratio_threshold is not None and ratio > compression_ratio_threshold:
                needs_fallback = True  # looping/repetitive output
            if logprob_threshold is not None and avg_logprob < logprob_threshold:
                needs_fallback = True  # low-confidence output
            if (
                no_speech_threshold is not None
                and float(out["nospeech_prob"][best]) > no_speech_threshold
            ):
                # confident silence: keep the t=0 result and let the
                # voice-activity gate below skip the chunk — climbing the
                # ladder would only sample hallucinations (openai-whisper's
                # no-speech early exit)
                needs_fallback = False
            chosen = {
                "tokens": gen,
                "temperature": float(t),
                "avg_logprob": avg_logprob,
                "compression_ratio": ratio,
                "no_speech_prob": float(out["nospeech_prob"][best]),
            }
            if not needs_fallback:
                break
        assert chosen is not None

        # voice-activity gate: confident silence skips the chunk entirely
        skipped = False
        if (
            no_speech_threshold is not None
            and chosen["no_speech_prob"] > no_speech_threshold
            and (
                logprob_threshold is None
                or chosen["avg_logprob"] < logprob_threshold
            )
        ):
            skipped = True
            chosen["tokens"] = []

        chunk_tokens.append(chosen["tokens"])
        segments.append(
            {
                "temperature": chosen["temperature"],
                "avg_logprob": chosen["avg_logprob"],
                "compression_ratio": chosen["compression_ratio"],
                "no_speech_prob": chosen["no_speech_prob"],
                "context_len": len(ctx_tail),
                "skipped": skipped,
            }
        )

        # context carry-over; a high-temperature rescue resets the context
        # (its text is unreliable as a prompt)
        if not condition_on_previous_text or chosen["temperature"] > 0.5:
            context = []
        elif not skipped:
            context = (context + chosen["tokens"])[-max(CTX_BUCKETS):]

    text = None
    if decode_text is not None:
        text = " ".join(
            decode_text(toks).strip() for toks in chunk_tokens if toks
        ).strip()
    return {"chunk_tokens": chunk_tokens, "segments": segments, "text": text}
