"""Benchmark: Whisper-tiny 30 s-clip embedding throughput per TPU chip.

Runs the flagship extraction path (fused Pallas log-mel -> bf16 Whisper-tiny
encoder -> mean-pooled embedding) on the real TPU and compares against the CPU
reference implementation (torch/transformers WhisperModel encoder + numpy
WhisperFeatureExtractor, float32 — the same stack the reference repo's
out-of-repo extraction used; SURVEY.md §6 north star is >=10x that per chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "30s-clips/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _tpu_throughput(batch: int = 512, iters: int = 20) -> float:
    # batch sweep: 64: 1366, 128: 1537, 192: 1507, 256: 1589 (round 2);
    # round 4 idle-box head-to-head: 256: 1563/1569 vs 512: 1605/1627 —
    # 512 is consistently ~4% ahead (deeper pipelining of the 30-s mel
    # grid against the encoder), larger batches show no further gain
    import jax
    import jax.numpy as jnp

    from wealy_tpu.audio.mel import N_SAMPLES
    from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
    from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS

    cfg = WHISPER_CONFIGS["tiny"]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, 3000), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), mel0, jnp.zeros((1, 4), jnp.int32)
    )["params"]

    # NOTE: params must be jit ARGUMENTS, not closure constants — closed-over
    # param trees blow up the remote-compile request (HTTP 413) and compile
    # time (minutes -> seconds). See BENCH_NOTES.md.
    @jax.jit
    def embed(params, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=cfg.n_mels)
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        return jnp.mean(states, axis=1)

    x = jnp.asarray(rng.normal(size=(batch, N_SAMPLES)).astype(np.float32) * 0.1)
    np.asarray(embed(params, x))  # compile + warm

    # Timing through the remote-TPU tunnel is subtle: block_until_ready alone
    # can return before execution finishes (impossible numbers), while a
    # host readback per iteration serializes a ~30 ms tunnel round trip into
    # every step. So: chain iterations ON DEVICE (step i+1 consumes a scalar
    # from step i's output — forces serial execution) and read back once.
    @jax.jit
    def chained(params, x, n_arr):
        def body(carry, _):
            out = embed(params, x + carry)
            return out[0, 0].astype(x.dtype) * 0.0, out[0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0).astype(x.dtype), n_arr)
        return outs

    n_arr = jnp.zeros((iters,), jnp.float32)
    np.asarray(chained(params, x, n_arr))  # compile
    t0 = time.perf_counter()
    sink = np.asarray(chained(params, x, n_arr))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(sink).all()
    return batch / dt


def _cpu_baseline_throughput(iters: int = 3) -> float:
    """Reference stack on CPU: transformers WhisperModel (tiny arch, f32) +
    WhisperFeatureExtractor, one 30 s clip at a time."""
    import torch
    from transformers import WhisperConfig as HFConfig, WhisperFeatureExtractor, WhisperModel

    torch.set_num_threads(os.cpu_count() or 8)
    hf_cfg = HFConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=384,
        encoder_layers=4,
        encoder_attention_heads=6,
        decoder_layers=4,
        decoder_attention_heads=6,
        encoder_ffn_dim=1536,
        decoder_ffn_dim=1536,
        max_source_positions=1500,
        max_target_positions=448,
    )
    enc = WhisperModel(hf_cfg).eval().encoder
    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    clip = (rng.normal(size=16000 * 30) * 0.1).astype(np.float32)

    with torch.no_grad():
        mel = fe(clip, sampling_rate=16000, return_tensors="pt", padding="max_length").input_features
        enc(mel)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            mel = fe(
                clip, sampling_rate=16000, return_tensors="pt", padding="max_length"
            ).input_features
            enc(mel)
        dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def main():
    tpu = _tpu_throughput()
    try:
        cpu = _cpu_baseline_throughput()
    except Exception as e:  # baseline failure must not kill the bench
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
        cpu = None
    result = {
        "metric": "whisper-tiny 30s-clip embed throughput (pallas mel + bf16 encoder)",
        "value": round(tpu, 1),
        "unit": "30s-clips/sec/chip",
        "vs_baseline": round(tpu / cpu, 1) if cpu else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
