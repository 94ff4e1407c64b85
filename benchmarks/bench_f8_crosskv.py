"""Exploratory: store cross-attention K/V in float8_e4m3 (HBM bandwidth is
the decode floor), upcast at use. Measures per-step time and hidden-state
error vs bf16 cross-KV."""
import json, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS
from wealy_tpu.models.whisper.generate import init_kv_caches

cfg = WHISPER_CONFIGS["tiny"]
model = Whisper(cfg, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_mels, 3000), jnp.float32), jnp.zeros((1, 4), jnp.int32))["params"]
B, steps, max_len = 128, 63, 64
rng = np.random.default_rng(0)
enc = jnp.asarray(rng.normal(size=(B, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32)).astype(jnp.bfloat16)

def run(f8):
    def steps_fn(params, enc):
        caches = init_kv_caches(cfg, B, max_len)
        xa_kv = model.apply({"params": params}, enc, method=Whisper.precompute_cross_kv)
        if f8:
            xa_kv = [(k.astype(jnp.float8_e4m3fn), v.astype(jnp.float8_e4m3fn)) for k, v in xa_kv]
        xa_use = [(k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)) for k, v in xa_kv] if False else xa_kv
        tok0 = jnp.full((B, 1), cfg.sot, jnp.int32)
        def body(state):
            i, tok, caches, h = state
            hid, logits, caches = model.apply(
                {"params": params}, tok, enc, kv_caches=caches, cache_index=i,
                xa_kv=[(k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)) for k, v in xa_use],
                method=Whisper.decode)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return (i + 1, nxt, caches, hid)
        _, tok, _, hid = lax.while_loop(lambda s: s[0] < steps, body,
            (jnp.int32(0), tok0, caches, jnp.zeros((B, 1, cfg.n_text_state), jnp.bfloat16)))
        return tok, hid
    return steps_fn

for f8 in (False, True):
    steps_fn = run(f8)
    fn = jax.jit(lambda p, e: steps_fn(p, e))
    tok, hid = fn(params, enc)
    if not f8:
        hid_ref = np.asarray(hid, np.float32)
    else:
        hid_f8 = np.asarray(hid, np.float32)
        err = np.abs(hid_f8 - hid_ref).max() / (np.abs(hid_ref).max() + 1e-9)
        print(json.dumps({"f8_hidden_rel_err": float(err)}), flush=True)
    @jax.jit
    def chained(params, enc, n_arr, sfn=steps_fn):
        def body(carry, _):
            t, h = sfn(params, enc + carry)
            return t[0, 0].astype(enc.dtype) * 0, t[0, 0]
        _, outs = lax.scan(body, jnp.bfloat16(0.0), n_arr)
        return outs
    n_arr = jnp.zeros((8,), jnp.float32)
    np.asarray(chained(params, enc, n_arr))
    t0 = time.perf_counter(); np.asarray(chained(params, enc, n_arr)); dt = (time.perf_counter()-t0)/8
    print(json.dumps({"f8": f8, "ms_per_seq": round(dt*1e3,2), "us_per_step": round(dt/steps*1e6,1)}), flush=True)
