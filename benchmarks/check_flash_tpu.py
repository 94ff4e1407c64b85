"""Real-TPU numerics check: natural-layout flash kernel vs XLA reference
attention, several (H, Dh, T) shapes incl. head-grouped wide configs."""
import json
import numpy as np
import jax
import jax.numpy as jnp
from wealy_tpu.ops.flash_attention import flash_mha, _reference_mha, _head_group

for (B, T, H, Dh) in [(4, 1500, 6, 64), (2, 1500, 8, 64), (2, 1500, 20, 64), (2, 700, 12, 64), (2, 300, 1, 64)]:
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32)).astype(jnp.bfloat16)
    scale = Dh ** -0.5
    got = np.asarray(flash_mha(q, k, v, scale).astype(jnp.float32))
    want = np.asarray(_reference_mha(q, k, v, scale).astype(jnp.float32))
    err = float(np.max(np.abs(got - want)))
    print(json.dumps({"shape": [B, T, H, Dh], "group": _head_group(H, Dh), "max_abs_err": err}), flush=True)
    assert err < 2e-2, err
print("tpu flash numerics ok")
