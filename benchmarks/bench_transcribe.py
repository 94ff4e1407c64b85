"""Batched-transcription device throughput (round-3 VERDICT missing #3: no
transcription throughput number existed anywhere).

Times exactly the jitted device path of `transcribe --batched --greedy`
(`wealy_tpu.cli.transcribe.make_transcribe_fn`): fused Pallas mel -> bf16
encoder -> greedy token decode with KV cache, returning (tokens, lengths).
Forced-length decode (eot=-1) so early exit never fires — the worst case and
the only batch-composition-independent one. Chained-iteration timing per
BENCH_NOTES methodology (scan on device, one readback).

Reference workload: the ~100K-file transcription trees the reference's
cache/dataset consume (lib/audio_dataset/cache.py:46-90) — i.e. one 30 s
chunk per row here corresponds to one chunk of a corpus song; songs/s =
chunks/s / chunks-per-song (SHS mean ~8 chunks at 240 s).

    python benchmarks/bench_transcribe.py [B,B,...] [max_len,max_len,...]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wealy_tpu.audio.mel import N_SAMPLES
from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS
from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode

CHUNKS_PER_SONG = 8  # SHS mean (~240 s songs / 30 s chunks)


def main(batches=(16, 64, 128), max_lens=(64, 224), size="tiny", iters=4,
         beam=1):
    cfg = WHISPER_CONFIGS[size]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, 3000), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), mel0, jnp.zeros((1, 4), jnp.int32)
    )["params"]
    prompt = default_prompt(cfg, language=0)

    for max_len in max_lens:

        @jax.jit
        def run(p, audio):
            mel = log_mel_spectrogram_pallas(audio, n_mels=cfg.n_mels)
            enc = model.apply({"params": p}, mel, method=Whisper.encode)
            if beam > 1:
                from wealy_tpu.models.whisper.beam import beam_decode

                out = beam_decode(
                    model, p, enc, cfg, prompt=prompt, beam_size=beam,
                    max_len=max_len, eot=-1,
                )
            else:
                out = greedy_decode(
                    model, p, enc, cfg, prompt=prompt, max_len=max_len,
                    eot=-1,
                )
            return out["tokens"], out["lengths"]

        for B in batches:
            x = jnp.asarray(
                rng.normal(size=(B, N_SAMPLES)).astype(np.float32) * 0.1
            )

            @jax.jit
            def chained(p, x, n_arr):
                def body(carry, _):
                    toks, L = run(p, x + carry)
                    return (
                        toks[0, 0].astype(x.dtype) * 0.0,
                        toks[0, -1],
                    )
                _, outs = jax.lax.scan(body, jnp.float32(0.0), n_arr)
                return outs

            n_arr = jnp.zeros((iters,), jnp.float32)
            t0 = time.perf_counter()
            np.asarray(chained(params, x, n_arr))  # compile
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            sink = np.asarray(chained(params, x, n_arr))
            dt = (time.perf_counter() - t0) / iters
            assert np.isfinite(sink).all()
            print(json.dumps({
                "size": size, "B": B, "max_len": max_len, "beam": beam,
                "ms_per_batch": round(dt * 1e3, 2),
                "chunks_per_s": round(B / dt, 1),
                "songs_per_s": round(B / dt / CHUNKS_PER_SONG, 2),
                "compile_s": round(compile_s, 1),
            }), flush=True)


if __name__ == "__main__":
    bs = (
        tuple(int(b) for b in sys.argv[1].split(","))
        if len(sys.argv) > 1 else (16, 64, 128)
    )
    mls = (
        tuple(int(m) for m in sys.argv[2].split(","))
        if len(sys.argv) > 2 else (64, 224)
    )
    size = sys.argv[3] if len(sys.argv) > 3 else "tiny"
    beam = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    main(batches=bs, max_lens=mls, size=size, beam=beam)
