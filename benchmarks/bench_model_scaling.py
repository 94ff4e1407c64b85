"""Model-size scaling of encoder throughput / estimated MFU (round-2 kernel).

Chained on-device timing as bench.py; per-model batch sized to fit HBM.
MFU estimate: encoder FLOPs/clip (conv stem + attention + MLP matmuls)
against the 197 TFLOP/s v5e bf16 peak.
"""
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from wealy_tpu.audio.mel import N_SAMPLES
from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS


def encoder_gflops(cfg):
    T, D, L, H = cfg.n_audio_ctx, cfg.n_audio_state, cfg.n_audio_layer, cfg.n_audio_head
    Tm = 2 * T  # mel frames
    conv = 2 * Tm * cfg.n_mels * D * 3 + 2 * T * D * D * 3
    attn_proj = 4 * 2 * T * D * D
    attn_mm = 2 * 2 * T * T * D
    mlp = 2 * 2 * T * D * 4 * D
    return (conv + L * (attn_proj + attn_mm + mlp)) / 1e9


def run(name, batch, iters=10):
    cfg = WHISPER_CONFIGS[name]
    model = Whisper(cfg, dtype=jnp.bfloat16, scan_layers=True)
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, 3000), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel0, jnp.zeros((1, 4), jnp.int32))["params"]

    @jax.jit
    def embed(params, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=cfg.n_mels)
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        return jnp.mean(states, axis=1)

    @jax.jit
    def chained(params, x, n_arr):
        def body(carry, _):
            out = embed(params, x + carry)
            return out[0, 0].astype(x.dtype) * 0.0, out[0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), n_arr)
        return outs

    x = jnp.asarray(rng.normal(size=(batch, N_SAMPLES)).astype(np.float32) * 0.1)
    n_arr = jnp.zeros((iters,), jnp.float32)
    np.asarray(chained(params, x, n_arr))
    t0 = time.perf_counter()
    np.asarray(chained(params, x, n_arr))
    dt = (time.perf_counter() - t0) / iters
    cps = batch / dt
    gf = encoder_gflops(cfg)
    mfu = gf * cps / 1e3 / 197.0
    print(json.dumps({"model": name, "B": batch, "clips_per_s": round(cps, 1),
                      "gflop_per_clip": round(gf, 1), "est_mfu": round(mfu, 3)}), flush=True)


if __name__ == "__main__":
    for name, b in (("tiny", 128), ("base", 64), ("small", 32), ("large-v3-turbo", 16)):
        run(name, b)
