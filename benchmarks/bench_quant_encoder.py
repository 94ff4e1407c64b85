"""int8 W8A8 encoder vs bf16 encoder: extraction throughput + perturbation.

Same harness as bench.py (device-chained scan through the remote tunnel,
params as jit arguments): fused Pallas mel -> encoder -> mean-pooled clip
embedding, batch 256. v5e multiplies int8 at 2x the bf16 MXU peak and the
dense projections are ~2/3 of encoder FLOPs, so the speed-of-light gain is
~1.5x where the encoder is matmul-bound (base and up; tiny is fixed-cost
bound). Perturbation is reported as the pooled-embedding cosine between the
two paths on the same input.

    python benchmarks/bench_quant_encoder.py [sizes,...] [batch] [iters]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wealy_tpu.cli.main import _apply_platform_env

_apply_platform_env()


def run(size: str, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from wealy_tpu.audio.mel import N_SAMPLES
    from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
    from wealy_tpu.models.whisper import WHISPER_CONFIGS
    from wealy_tpu.models.whisper.model import WhisperEncoder
    from wealy_tpu.models.whisper.quant import (
        quant_encode_fn,
        quantize_encoder_params,
    )

    cfg = WHISPER_CONFIGS[size]
    enc = WhisperEncoder(cfg, dtype=jnp.bfloat16, scan_layers=True)
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, 3000), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), mel0)["params"]
    qparams = quantize_encoder_params(
        jax.tree_util.tree_map(np.asarray, dict(params)), cfg
    )
    qenc = quant_encode_fn(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def embed_bf16(params, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=cfg.n_mels)
        return jnp.mean(enc.apply({"params": params}, mel), axis=1)

    @jax.jit
    def embed_int8(qparams, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=cfg.n_mels)
        return jnp.mean(qenc(qparams, mel), axis=1)

    x = jnp.asarray(
        rng.normal(size=(batch, N_SAMPLES)).astype(np.float32) * 0.1
    )
    a = np.asarray(embed_bf16(params, x), np.float32)
    b = np.asarray(embed_int8(qparams, x), np.float32)
    cos = float(np.min(
        (a * b).sum(-1)
        / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    ))

    def chained_rate(fn, p):
        @jax.jit
        def chained(p, x, n_arr):
            def body(carry, _):
                out = fn(p, x + carry)
                return out[0, 0].astype(x.dtype) * 0.0, out[0, 0]
            _, outs = jax.lax.scan(
                body, jnp.float32(0.0).astype(x.dtype), n_arr
            )
            return outs

        n_arr = jnp.zeros((iters,), jnp.float32)
        np.asarray(chained(p, x, n_arr))  # compile
        t0 = time.perf_counter()
        sink = np.asarray(chained(p, x, n_arr))
        assert np.isfinite(sink).all()
        return batch / ((time.perf_counter() - t0) / iters)

    r_bf16 = chained_rate(embed_bf16, params)
    r_int8 = chained_rate(embed_int8, qparams)
    print(json.dumps({
        "size": size, "batch": batch,
        "bf16_clips_per_s": round(r_bf16, 1),
        "int8_clips_per_s": round(r_int8, 1),
        "speedup": round(r_int8 / r_bf16, 3),
        "pooled_cos_min": round(cos, 5),
    }), flush=True)


if __name__ == "__main__":
    sizes = sys.argv[1].split(",") if len(sys.argv) > 1 else ["tiny", "base", "small"]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    for s in sizes:
        run(s, batch, iters)
