"""Decoder-embedding extraction benchmark (hs_last_seq workload): fused mel ->
bf16 encoder -> greedy decode with KV cache, 64 tokens FORCED (eot=-1 so
early exit never fires — worst-case apples-to-apples with round 1's 390
clips/s at B=16). Chained-iteration timing per BENCH_NOTES methodology.

    python benchmarks/bench_decoder.py [B,...] [bf16|cross-f8|f8] [size] [max_len]

``size`` defaults to tiny; pass ``large-v3-turbo`` for the PRODUCTION
workload — the reference's consumed embedding taxonomy is 1280-dim
decoder states (lib/embedding_dataset/multimodal_dataset.py:313, the
turbo-based whisper_set). Reports an estimated MFU split (encoder vs
decode steps) so the bottleneck is named, not guessed."""
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

_PEAK_TFLOPS = 197.0  # v5e bf16 peak (bench_model_scaling convention)


def _flops_per_clip(cfg, max_len: int) -> dict:
    """Matmul FLOPs per clip: encoder forward + max_len decode steps.
    Decode-step FLOPs are per-token (KV cache reused); cross-attention
    K/V projection of the 1500-frame encoder states counts once."""
    T, D, L = cfg.n_audio_ctx, cfg.n_audio_state, cfg.n_audio_layer
    Tm = 2 * T
    conv = 2 * Tm * cfg.n_mels * D * 3 + 2 * T * D * D * 3
    enc = conv + L * (4 * 2 * T * D * D + 2 * 2 * T * T * D + 2 * 2 * T * D * 4 * D)
    Dt, Lt = cfg.n_text_state, cfg.n_text_layer
    cross_kv = Lt * 2 * 2 * T * Dt * Dt  # once per clip
    per_tok = Lt * (
        4 * 2 * Dt * Dt          # self q/k/v/o projections
        + 2 * 2 * Dt * Dt        # cross q/o projections
        + 2 * max_len * Dt       # self attention reads (avg ~max_len/2; upper bound)
        + 2 * 2 * T * Dt         # cross attention reads
        + 2 * 2 * Dt * 4 * Dt    # MLP
    ) + 2 * Dt * cfg.n_vocab     # logits
    dec = cross_kv + max_len * per_tok
    return {"enc_gflops": enc / 1e9, "dec_gflops": dec / 1e9}


def main(batches=(16, 64, 128), max_len=64, iters=8, kv_mode="bf16",
         size="tiny", scan_layers=False):
    cfg = WHISPER_CONFIGS[size]
    model = Whisper(cfg, dtype=jnp.bfloat16, scan_layers=scan_layers)
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
        fl = _flops_per_clip(cfg, max_len)
        total_gflops = fl["enc_gflops"] + fl["dec_gflops"]
        print(json.dumps({
            "B": B, "max_len": max_len, "kv": kv_mode, "size": size,
            "scan_layers": scan_layers,
            "ms_per_batch": round(dt * 1e3, 2),
            "clips_per_s": round(B / dt, 1), "compile_s": round(compile_s, 1),
            "est_mfu_pct": round(
                100 * (B / dt) * total_gflops / (_PEAK_TFLOPS * 1e3), 1
            ),
            "enc_gflops_per_clip": round(fl["enc_gflops"], 1),
            "dec_gflops_per_clip": round(fl["dec_gflops"], 1),
        }), flush=True)


if __name__ == "__main__":
    bs = tuple(int(b) for b in sys.argv[1].split(",")) if len(sys.argv) > 1 else (16, 64, 128)
    mode = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    sz = sys.argv[3] if len(sys.argv) > 3 else "tiny"
    ml = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    main(batches=bs, kv_mode=mode, size=sz, max_len=ml,
         scan_layers=(sz not in ("dev", "tiny")))
