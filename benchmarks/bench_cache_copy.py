"""Test: does per-step decode cost scale with KV-cache SIZE (max_len) at
fixed step count? If yes, the while_loop is copying caches, not updating
in place."""
import json, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS
from wealy_tpu.models.whisper.generate import init_kv_caches

cfg = WHISPER_CONFIGS["tiny"]
model = Whisper(cfg, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_mels, 3000), jnp.float32), jnp.zeros((1, 4), jnp.int32))["params"]
B = 128
steps = 63
rng = np.random.default_rng(0)
enc = jnp.asarray(rng.normal(size=(B, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32)).astype(jnp.bfloat16)

for max_len in (64, 224):
    def steps_fn(params, enc, ml=max_len):
        caches = init_kv_caches(cfg, B, ml)
        xa_kv = model.apply({"params": params}, enc, method=Whisper.precompute_cross_kv)
        tok0 = jnp.full((B, 1), cfg.sot, jnp.int32)
        def body(state):
            i, tok, caches = state
            _, logits, caches = model.apply({"params": params}, tok, enc, kv_caches=caches, cache_index=i, xa_kv=xa_kv, method=Whisper.decode)
            return (i + 1, jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None], caches)
        _, tok, _ = lax.while_loop(lambda s: s[0] < steps, body, (jnp.int32(0), tok0, caches))
        return tok
    @jax.jit
    def chained(params, enc, n_arr, ml=max_len):
        def body(carry, _):
            t = steps_fn(params, enc + carry)
            return t[0, 0].astype(enc.dtype) * 0, t[0, 0]
        _, outs = lax.scan(body, jnp.bfloat16(0.0), n_arr)
        return outs
    n_arr = jnp.zeros((8,), jnp.float32)
    np.asarray(chained(params, enc, n_arr))
    t0 = time.perf_counter(); np.asarray(chained(params, enc, n_arr)); dt = (time.perf_counter()-t0)/8
    print(json.dumps({"max_len": max_len, "steps": steps, "ms_per_seq": round(dt*1e3,2), "us_per_step": round(dt/steps*1e6,1)}), flush=True)
