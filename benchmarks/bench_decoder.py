"""Decoder-embedding extraction benchmark (hs_last_seq workload): fused mel ->
bf16 tiny encoder -> greedy decode with KV cache, 64 tokens FORCED (eot=-1 so
early exit never fires — worst-case apples-to-apples with round 1's 390
clips/s at B=16). Chained-iteration timing per BENCH_NOTES methodology."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from wealy_tpu.audio.mel import N_SAMPLES
from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS
from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode


def main(batches=(16, 64, 128), max_len=64, iters=8, kv_mode="bf16"):
    cfg = WHISPER_CONFIGS["tiny"]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, 3000), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel0, jnp.zeros((1, 4), jnp.int32))["params"]
    prompt = default_prompt(cfg, language=0)
    # kv_mode: bf16 | cross-f8 | f8 (cross+self)
    cross_dtype = jnp.float8_e4m3fn if kv_mode in ("cross-f8", "f8") else None
    self_dtype = jnp.float8_e4m3fn if kv_mode == "f8" else None

    @jax.jit
    def decode_batch(params, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=cfg.n_mels)
        enc = model.apply({"params": params}, mel, method=Whisper.encode)
        out = greedy_decode(
            model, params, enc, cfg, prompt=prompt, max_len=max_len, eot=-1,
            cross_kv_dtype=cross_dtype, self_kv_dtype=self_dtype,
        )
        return out["hidden"], out["lengths"]

    for B in batches:
        x = jnp.asarray(rng.normal(size=(B, N_SAMPLES)).astype(np.float32) * 0.1)

        @jax.jit
        def chained(params, x, n_arr):
            def body(carry, _):
                h, L = decode_batch(params, x + carry)
                return h[0, 0, 0].astype(x.dtype) * 0.0, h[0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.float32(0.0).astype(x.dtype), n_arr)
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
            "B": B, "max_len": max_len, "kv": kv_mode,
            "ms_per_batch": round(dt * 1e3, 2),
            "clips_per_s": round(B / dt, 1), "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    bs = tuple(int(b) for b in sys.argv[1].split(",")) if len(sys.argv) > 1 else (16, 64, 128)
    mode = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    main(batches=bs, kv_mode=mode)
