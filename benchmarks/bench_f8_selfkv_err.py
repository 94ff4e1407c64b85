"""Numerics of f8 SELF-KV storage (round 3): full greedy trajectories with
bf16 vs float8 self-attention caches — unlike the constant cross memory,
self-cache quantization error feeds back through the token sequence, so the
honest metric is end-to-end trajectory agreement, not one teacher-forced
step. Random-init tiny (no pretrained weights in this environment); re-run
via parity_harness the moment real weights appear."""
import json

import numpy as np
import jax
import jax.numpy as jnp

from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS
from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode

cfg = WHISPER_CONFIGS["tiny"]
model = Whisper(cfg, dtype=jnp.bfloat16)
params = model.init(
    jax.random.PRNGKey(0),
    jnp.zeros((1, cfg.n_mels, 3000), jnp.float32),
    jnp.zeros((1, 4), jnp.int32),
)["params"]
B, MAXLEN = 8, 32
rng = np.random.default_rng(0)
enc = jnp.asarray(
    rng.normal(size=(B, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32)
).astype(jnp.bfloat16)
prompt = default_prompt(cfg, language=0)

outs = {}
for name, dt in (("bf16", None), ("f8", jnp.float8_e4m3fn)):
    out = greedy_decode(
        model, params, enc, cfg, prompt=prompt, max_len=MAXLEN, self_kv_dtype=dt
    )
    outs[name] = {
        "tokens": np.asarray(out["tokens"]),
        "hidden": np.asarray(out["hidden"], np.float32),
        "lengths": np.asarray(out["lengths"]),
    }

P = len(prompt)
ref, got = outs["bf16"], outs["f8"]
gen_ref = ref["tokens"][:, P:]
gen_got = got["tokens"][:, P:]
tok_flip = float((gen_ref != gen_got).mean())
h_err = float(
    np.abs(got["hidden"] - ref["hidden"]).max() / np.abs(ref["hidden"]).max()
)
print(json.dumps({
    "B": B, "max_len": MAXLEN,
    "token_flip_rate": round(tok_flip, 4),
    "hidden_rel_err_max": round(h_err, 4),
    "lengths_equal_frac": float((ref["lengths"] == got["lengths"]).mean()),
}))
