"""Isolate the per-step decode cost: with vs without the precomputed
cross-attention K/V, across batch sizes. Chained timing of a fixed number of
single-token steps (no mel/encoder, no prefill) — the pure autoregressive
inner loop."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS
from wealy_tpu.models.whisper.generate import init_kv_caches


def main(batches=(16, 128), steps=63, max_len=64, iters=10):
    cfg = WHISPER_CONFIGS["tiny"]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 3000), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
    )["params"]

    for B in batches:
        enc = jnp.asarray(
            rng.normal(size=(B, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def steps_fn(params, enc, use_xa_kv):
            caches = init_kv_caches(cfg, B, max_len)
            xa_kv = (
                model.apply({"params": params}, enc, method=Whisper.precompute_cross_kv)
                if use_xa_kv else None
            )
            tok0 = jnp.full((B, 1), cfg.sot, jnp.int32)

            def body(state):
                i, tok, caches = state
                _, logits, caches = model.apply(
                    {"params": params}, tok, enc,
                    kv_caches=caches, cache_index=i, xa_kv=xa_kv,
                    method=Whisper.decode,
                )
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                return (i + 1, nxt, caches)

            i, tok, caches = lax.while_loop(
                lambda s: s[0] < steps, body, (jnp.int32(0), tok0, caches)
            )
            return tok

        for use_xa in (False, True):
            fn = jax.jit(lambda p, e, u=use_xa: steps_fn(p, e, u))

            @jax.jit
            def chained(params, enc, n_arr, u=use_xa):
                def body(carry, _):
                    t = steps_fn(params, enc + carry, u)
                    return t[0, 0].astype(enc.dtype) * 0, t[0, 0]
                _, outs = lax.scan(body, jnp.bfloat16(0.0), n_arr)
                return outs

            n_arr = jnp.zeros((iters,), jnp.float32)
            np.asarray(chained(params, enc, n_arr))
            t0 = time.perf_counter()
            np.asarray(chained(params, enc, n_arr))
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "B": B, "steps": steps, "xa_kv": use_xa,
                "ms_per_seq": round(dt * 1e3, 2),
                "us_per_step": round(dt / steps * 1e6, 1),
                "clips_per_s_decode_only": round(B / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    bs = tuple(int(b) for b in sys.argv[1].split(",")) if len(sys.argv) > 1 else (16, 128)
    main(batches=bs)
