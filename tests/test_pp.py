"""Pipeline-parallel encoder (parallel/pp.py): the GPipe schedule over a
``stage`` mesh axis must reproduce the single-device scan-layers encoder
exactly — stage slicing of the stacked layer axis + ppermute rotation is a
pure re-scheduling of the same ops. The reference has no parallelism at all
(SURVEY.md §2.8); this is one of the TPU-native first-class components."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wealy_tpu.models.whisper.config import WhisperConfig
from wealy_tpu.models.whisper.model import WhisperEncoder
from wealy_tpu.parallel.pp import make_pp_mesh, pp_encode_fn

CFG = WhisperConfig(
    n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=2,
    n_audio_layer=4, n_vocab=64, n_text_ctx=8, n_text_state=32,
    n_text_head=2, n_text_layer=1,
)


@pytest.fixture(scope="module")
def encoder_and_params():
    enc = WhisperEncoder(CFG, dtype=jnp.float32, scan_layers=True)
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, CFG.n_mels, 32))
        .astype(np.float32)
    )
    params = enc.init(jax.random.PRNGKey(0), mel)["params"]
    want = np.asarray(jax.jit(lambda p, m: enc.apply({"params": p}, m))(
        params, mel
    ))
    return enc, params, mel, want


@pytest.mark.parametrize("n_stage,n_micro", [(2, 4), (4, 2), (4, 8)])
def test_pp_matches_single_device(encoder_and_params, n_stage, n_micro):
    enc, params, mel, want = encoder_and_params
    mesh = make_pp_mesh(n_stage, devices=jax.devices()[:n_stage])
    got = np.asarray(pp_encode_fn(enc, mesh, n_micro=n_micro)(params, mel))
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-5, f"S={n_stage} M={n_micro}: max_err={err}"


def test_pp_bf16_production_dtype(encoder_and_params):
    """bf16 (the extraction dtype) flows through the schedule: same result
    as the single-device bf16 encoder within bf16 noise."""
    _, params, mel, _ = encoder_and_params
    enc16 = WhisperEncoder(CFG, dtype=jnp.bfloat16, scan_layers=True)
    want = np.asarray(enc16.apply({"params": params}, mel), dtype=np.float32)
    mesh = make_pp_mesh(4, devices=jax.devices()[:4])
    got = np.asarray(
        pp_encode_fn(enc16, mesh, n_micro=2)(params, mel), dtype=np.float32
    )
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_pp_composes_with_dp(encoder_and_params):
    """(data=2, stage=4) mesh: batch row-sharded over data, each slice
    pipelined over stage."""
    enc, params, mel, want = encoder_and_params
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_pp_mesh(4, n_data=2, devices=jax.devices()[:8])
    got = np.asarray(pp_encode_fn(enc, mesh, n_micro=2)(params, mel))
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-5, f"dp x pp: max_err={err}"


def test_pp_is_trainable(encoder_and_params):
    """The scan-based schedule is reverse-differentiable: grads of a scalar
    loss through the pipelined encoder equal the single-device grads (the
    ppermute/psum transposes route each stage's contribution home)."""
    enc, params, mel, _ = encoder_and_params
    g_sd = jax.grad(
        lambda p: (enc.apply({"params": p}, mel) ** 2).mean()
    )(params)
    mesh = make_pp_mesh(4, devices=jax.devices()[:4])
    pp = pp_encode_fn(enc, mesh, n_micro=2)
    g_pp = jax.grad(lambda p: (pp(p, mel) ** 2).mean())(params)
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(g_sd)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(g_pp)),
    ):
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(ka)
        )


def test_pp_train_step_matches_single_device(encoder_and_params):
    """End-to-end pp TRAINING: the generic train step with its model_call
    routed through the pipelined encoder on a (data=2, stage=4) mesh
    reproduces the single-device update (loss + post-step params)."""
    from wealy_tpu.losses import clews_loss
    from wealy_tpu.models.heads import ProjectionHead
    from wealy_tpu.train import make_train_step
    from wealy_tpu.train.state import TrainState, make_optimizer
    from wealy_tpu.train.step import shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    enc, enc_params, mel, _ = encoder_and_params
    B = mel.shape[0]
    head = ProjectionHead(zdim=16, hidden=(16,), dtype=jnp.float32)
    h0 = jnp.zeros((B, CFG.n_audio_ctx, CFG.n_audio_state), jnp.float32)
    head_p = head.init(
        jax.random.PRNGKey(1), h0, jnp.ones((B, CFG.n_audio_ctx), bool)
    )["params"]
    params = jax.device_get({"encoder": enc_params, "head": head_p})
    batch = {
        "emb": mel,
        "labels": jnp.asarray(np.repeat(np.arange(B // 2), 2), jnp.int32),
        "ids": jnp.arange(B, dtype=jnp.int32),
    }

    def fresh_state(p):
        tx = make_optimizer(lr=1e-3, warmup_steps=1, max_steps=10)
        return TrainState(step=jnp.zeros((), jnp.int32), params=p,
                          opt_state=tx.init(p), tx=tx)

    def call_sd(p, b):
        states = enc.apply({"params": p["encoder"]}, b["emb"])
        return head.apply(
            {"params": p["head"]}, states, jnp.ones(states.shape[:2], bool)
        )

    step_sd = make_train_step(head, clews_loss, mesh=None, model_call=call_sd)
    new_sd, logs_sd = step_sd(
        fresh_state(jax.tree_util.tree_map(jnp.asarray, params)), dict(batch)
    )
    want = jax.device_get(new_sd.params)

    mesh = make_pp_mesh(4, n_data=2, devices=jax.devices()[:8])
    pp = pp_encode_fn(enc, mesh, n_micro=2)

    def call_pp(p, b):
        states = pp(p, b["emb"])
        return head.apply(
            {"params": p["head"]}, states, jnp.ones(states.shape[:2], bool)
        )

    step_pp = make_train_step(head, clews_loss, mesh=mesh, model_call=call_pp)
    new_pp, logs_pp = step_pp(
        fresh_state(jax.tree_util.tree_map(jnp.asarray, params)),
        shard_batch(dict(batch), mesh),
    )
    assert abs(float(logs_pp["loss"]) - float(logs_sd["loss"])) < 1e-5
    got = jax.device_get(new_pp.params)
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-5, err_msg=jax.tree_util.keystr(ka)
        )


def test_pp_rejects_bad_shapes(encoder_and_params):
    enc, params, mel, _ = encoder_and_params
    with pytest.raises(ValueError, match="not divisible"):
        pp_encode_fn(enc, make_pp_mesh(3, devices=jax.devices()[:3]))
    mesh = make_pp_mesh(2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="n_micro"):
        pp_encode_fn(enc, mesh, n_micro=3)(params, mel)


def test_pp_rejects_unrolled_layout():
    enc_unrolled = WhisperEncoder(CFG, dtype=jnp.float32, scan_layers=False)
    mel = jnp.zeros((4, CFG.n_mels, 32), jnp.float32)
    params = enc_unrolled.init(jax.random.PRNGKey(0), mel)["params"]
    mesh = make_pp_mesh(2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="scan-layers"):
        pp_encode_fn(enc_unrolled, mesh)(params, mel)


def test_pp_from_stacked_unrolled_checkpoint():
    """stack_block_params converts an unrolled (block_i) tree into the scan
    layout PP consumes; the pipelined result must match the unrolled model."""
    from wealy_tpu.models.whisper.convert import stack_block_params

    enc_u = WhisperEncoder(CFG, dtype=jnp.float32, scan_layers=False)
    mel = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, CFG.n_mels, 32))
        .astype(np.float32)
    )
    params_u = enc_u.init(jax.random.PRNGKey(1), mel)["params"]
    want = np.asarray(enc_u.apply({"params": params_u}, mel))
    stacked = stack_block_params(
        jax.tree_util.tree_map(np.asarray, dict(params_u)), CFG.n_audio_layer
    )
    enc_s = WhisperEncoder(CFG, dtype=jnp.float32, scan_layers=True)
    mesh = make_pp_mesh(4, devices=jax.devices()[:4])
    got = np.asarray(pp_encode_fn(enc_s, mesh, n_micro=2)(stacked, mel))
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-5, f"stacked-checkpoint pp: max_err={err}"
