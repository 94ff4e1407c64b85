"""Teacher-forced numerics of f8 cross-KV: same token sequence both paths,
compare per-step hidden states."""
import json
import numpy as np
import jax
import jax.numpy as jnp
from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS
from wealy_tpu.models.whisper.generate import init_kv_caches

cfg = WHISPER_CONFIGS["tiny"]
model = Whisper(cfg, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_mels, 3000), jnp.float32), jnp.zeros((1, 4), jnp.int32))["params"]
B, T = 8, 24
rng = np.random.default_rng(0)
enc = jnp.asarray(rng.normal(size=(B, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32)).astype(jnp.bfloat16)
tokens = jnp.asarray(rng.integers(0, 50000, size=(B, T)), jnp.int32)

xa = model.apply({"params": params}, enc, method=Whisper.precompute_cross_kv)
outs = {}
for name, kv in (("bf16", xa),
                 ("f8", [(k.astype(jnp.float8_e4m3fn).astype(jnp.bfloat16),
                          v.astype(jnp.float8_e4m3fn).astype(jnp.bfloat16)) for k, v in xa])):
    caches = init_kv_caches(cfg, B, T)
    hid, logits, _ = model.apply({"params": params}, tokens, enc,
                                 kv_caches=caches, cache_index=0, xa_kv=kv,
                                 method=Whisper.decode)
    outs[name] = (np.asarray(hid, np.float32), np.asarray(logits, np.float32))
h_err = np.abs(outs["f8"][0] - outs["bf16"][0]).max() / np.abs(outs["bf16"][0]).max()
l_err = np.abs(outs["f8"][1] - outs["bf16"][1]).max() / np.abs(outs["bf16"][1]).max()
tok_flip = float((outs["f8"][1].argmax(-1) != outs["bf16"][1].argmax(-1)).mean())
print(json.dumps({"hidden_rel": float(h_err), "logits_rel": float(l_err), "argmax_flip_rate": tok_flip}))
