"""A/B: Whisper encoder conv stem as XLA conv1d (nn.Conv pair) vs as explicit
shifted-slice matmuls (sum over the 3 taps), the 'conv-stem-as-matmul' MFU
candidate from BENCH_NOTES/VERDICT. Numerics checked against the conv path."""
import json, time
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

B, T, MELS, D = 64, 3000, 80, 384
rng = np.random.default_rng(0)
mel = jnp.asarray(rng.normal(size=(B, T, MELS)).astype(np.float32)).astype(jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(3, MELS, D)).astype(np.float32) * 0.05)
b1 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.05)
w2 = jnp.asarray(rng.normal(size=(3, D, D)).astype(np.float32) * 0.05)
b2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.05)


def stem_conv(x):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), (1,), [(1, 1)],
        dimension_numbers=("NTC", "TIO", "NTC"), preferred_element_type=jnp.float32,
    ) + b1
    y = nn.gelu(y.astype(jnp.bfloat16), approximate=False)
    z = jax.lax.conv_general_dilated(
        y, w2.astype(jnp.bfloat16), (2,), [(1, 1)],
        dimension_numbers=("NTC", "TIO", "NTC"), preferred_element_type=jnp.float32,
    ) + b2
    return nn.gelu(z.astype(jnp.bfloat16), approximate=False)


def stem_matmul(x):
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0))).astype(jnp.bfloat16)
    w1b = w1.astype(jnp.bfloat16)
    y = (
        jnp.einsum("btc,cd->btd", xp[:, 0:T], w1b[0], preferred_element_type=jnp.float32)
        + jnp.einsum("btc,cd->btd", xp[:, 1 : T + 1], w1b[1], preferred_element_type=jnp.float32)
        + jnp.einsum("btc,cd->btd", xp[:, 2 : T + 2], w1b[2], preferred_element_type=jnp.float32)
        + b1
    )
    y = nn.gelu(y.astype(jnp.bfloat16), approximate=False)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))
    w2b = w2.astype(jnp.bfloat16)
    z = (
        jnp.einsum("btc,cd->btd", yp[:, 0:T:2], w2b[0], preferred_element_type=jnp.float32)
        + jnp.einsum("btc,cd->btd", yp[:, 1 : T + 1 : 2], w2b[1], preferred_element_type=jnp.float32)
        + jnp.einsum("btc,cd->btd", yp[:, 2 : T + 2 : 2], w2b[2], preferred_element_type=jnp.float32)
        + b2
    )
    return nn.gelu(z.astype(jnp.bfloat16), approximate=False)


def stem_matmul_reshape(x):
    """Stride-2 conv as reshape: pair frames (t even, t odd) -> one big matmul
    over 2*D channels for taps {0,1}, plus one shifted matmul for tap 2."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0))).astype(jnp.bfloat16)
    w1b = w1.astype(jnp.bfloat16)
    y = (
        jnp.einsum("btc,cd->btd", xp[:, 0:T], w1b[0], preferred_element_type=jnp.float32)
        + jnp.einsum("btc,cd->btd", xp[:, 1 : T + 1], w1b[1], preferred_element_type=jnp.float32)
        + jnp.einsum("btc,cd->btd", xp[:, 2 : T + 2], w1b[2], preferred_element_type=jnp.float32)
        + b1
    )
    y = nn.gelu(y.astype(jnp.bfloat16), approximate=False)
    yp = jnp.pad(y, ((0, 0), (1, 2), (0, 0)))  # pad to 3004 for clean reshape
    w2b = w2.astype(jnp.bfloat16)
    # taps 0,1 for output t live at yp[2t], yp[2t+1]: reshape (B,1501,2,D) pairs
    pairs = yp[:, : 3002].reshape(B, 1501, 2 * D)
    w01 = jnp.concatenate([w2b[0], w2b[1]], axis=0)  # (2D, D)
    z01 = jnp.einsum("btc,cd->btd", pairs[:, :1500], w01, preferred_element_type=jnp.float32)
    z2 = jnp.einsum(
        "btc,cd->btd", yp[:, 2 : 3002 : 2], w2b[2], preferred_element_type=jnp.float32
    )
    z = z01 + z2 + b2
    return nn.gelu(z.astype(jnp.bfloat16), approximate=False)


variants = {"conv": stem_conv, "matmul3": stem_matmul, "matmul_pair": stem_matmul_reshape}
ref = np.asarray(stem_conv(mel).astype(jnp.float32))
for name, fn in variants.items():
    got = np.asarray(fn(mel).astype(jnp.float32))
    print(json.dumps({"variant": name, "max_abs_diff": float(np.max(np.abs(got - ref)))}), flush=True)

flops = 2 * B * (T * 3 * MELS * D + (T // 2) * 3 * D * D)
for trial in range(2):
    for name, fn in variants.items():
        @jax.jit
        def chained(x, n_arr, fn=fn):
            def body(carry, _):
                o = fn(x + carry)
                return o[0, 0, 0] * 0, o[0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
            return outs
        n_arr = jnp.zeros((30,), jnp.float32)
        np.asarray(chained(mel, n_arr))
        t0 = time.perf_counter(); np.asarray(chained(mel, n_arr))
        dt = (time.perf_counter() - t0) / 30
        print(json.dumps({"trial": trial, "variant": name, "ms": round(dt * 1e3, 3), "tflops": round(flops / dt / 1e12, 1)}), flush=True)
