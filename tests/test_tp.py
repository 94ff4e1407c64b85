"""Tensor-parallel Whisper tests on the virtual 8-device mesh: TP-sharded
encoder output must equal the unsharded output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from wealy_tpu.models.whisper import WhisperConfig
from wealy_tpu.models.whisper.model import WhisperEncoder
from wealy_tpu.parallel.tp import (
    make_tp_mesh,
    shard_params,
    tp_encode_fn,
    whisper_param_shardings,
)


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(
        n_mels=8, n_audio_ctx=16, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    enc = WhisperEncoder(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), mel)["params"]
    return cfg, enc, params, mel


class TestShardingRules:
    def test_rule_assignment(self, setup):
        cfg, enc, params, mel = setup
        mesh = make_tp_mesh(n_model=4, n_data=2)
        shardings = whisper_param_shardings(params, mesh)
        b0 = shardings["block_0"]
        assert b0["attn"]["q"]["kernel"].spec == P(None, "model")
        assert b0["attn"]["out"]["kernel"].spec == P("model", None)
        assert b0["mlp_fc1"]["kernel"].spec == P(None, "model")
        assert b0["mlp_fc2"]["kernel"].spec == P("model", None)
        assert b0["attn_ln"]["scale"].spec == P()
        assert shardings["conv1"]["kernel"].spec == P()

    def test_k_has_no_bias_rule_needed(self, setup):
        cfg, enc, params, mel = setup
        assert "bias" not in params["block_0"]["attn"]["k"]


class TestTPEncoder:
    @pytest.mark.parametrize("n_model,n_data", [(4, 2), (2, 4), (8, 1)])
    def test_matches_unsharded(self, setup, n_model, n_data):
        cfg, enc, params, mel = setup
        want = np.asarray(enc.apply({"params": params}, mel))

        mesh = make_tp_mesh(n_model=n_model, n_data=n_data)
        sp = shard_params(params, mesh)
        encode = tp_encode_fn(enc, mesh)
        got = np.asarray(encode(sp, mel))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_params_actually_sharded(self, setup):
        cfg, enc, params, mel = setup
        mesh = make_tp_mesh(n_model=4, n_data=2)
        sp = shard_params(params, mesh)
        k = sp["block_0"]["mlp_fc1"]["kernel"]
        # each model shard holds 1/4 of the 4D output dim
        shard_shapes = {s.data.shape for s in k.addressable_shards}
        assert shard_shapes == {(64, 64)}  # (D, 4D/4)


class TestTPScannedEncoder:
    def test_scanned_tp_matches_unsharded(self, setup):
        from wealy_tpu.models.whisper.convert import stack_block_params

        cfg, enc, params, mel = setup
        want = np.asarray(enc.apply({"params": params}, mel))

        scanned = WhisperEncoder(cfg, dtype=jnp.float32, scan_layers=True)
        sp = stack_block_params(params, cfg.n_audio_layer)
        mesh = make_tp_mesh(n_model=4, n_data=2)
        sharded = shard_params(sp, mesh)
        # stacked kernel (L, D, 4D) must be sharded on its LAST dim
        k = sharded["blocks"]["block"]["mlp_fc1"]["kernel"]
        assert {s.data.shape for s in k.addressable_shards} == {(2, 64, 64)}
        got = np.asarray(tp_encode_fn(scanned, mesh)(sharded, mel))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSequenceParallel:
    """sequence_parallel=True (Megatron SP): the residual stream between
    blocks is time-sharded over the model axis; output must still equal the
    unsharded encoder (the constraint only re-schedules collectives)."""

    @pytest.mark.parametrize("scan", [False, True])
    def test_sp_matches_unsharded(self, setup, scan):
        from wealy_tpu.models.whisper.convert import stack_block_params

        cfg, enc, params, mel = setup
        want = np.asarray(enc.apply({"params": params}, mel))
        mesh = make_tp_mesh(n_model=4, n_data=2)
        if scan:
            enc = WhisperEncoder(cfg, dtype=jnp.float32, scan_layers=True)
            params = stack_block_params(params, cfg.n_audio_layer)
        sp = shard_params(params, mesh)
        got = np.asarray(
            tp_encode_fn(enc, mesh, sequence_parallel=True)(sp, mel)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_sp_constraint_actually_applied(self, setup):
        """The compiled SP program must contain the (data, model, None)
        activation sharding on an inter-block tensor."""
        cfg, enc, params, mel = setup
        mesh = make_tp_mesh(n_model=4, n_data=2)
        sp = shard_params(params, mesh)
        txt = tp_encode_fn(enc, mesh, sequence_parallel=True).lower(
            sp, mel
        ).as_text()
        base = tp_encode_fn(enc, mesh).lower(sp, mel).as_text()
        # (B, T, D) constrained to P(data, model, None): a time-axis "model"
        # sharding the plain-TP program never emits (shardy dialect text)
        marker = '[{"data"}, {"model"}, {}]'
        assert marker in txt
        assert marker not in base


class TestTPDecode:
    @pytest.mark.parametrize("n_model,n_data", [(2, 4), (4, 2)])
    def test_greedy_decode_matches_unsharded(self, n_model, n_data):
        """TP greedy decode (prefill + KV-cached while_loop) must produce the
        single-device tokens and hidden states: the Megatron shardings
        propagate through the decode loop with per-chip KV head shards."""
        from wealy_tpu.models.whisper.generate import greedy_decode
        from wealy_tpu.models.whisper.model import Whisper
        from wealy_tpu.parallel.tp import tp_decode_fn

        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=16, n_audio_state=64, n_audio_head=4,
            n_audio_layer=1, n_vocab=64, n_text_ctx=8, n_text_state=64,
            n_text_head=4, n_text_layer=2,
        )
        model = Whisper(cfg, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        B = 8
        mel = jnp.asarray(rng.normal(size=(B, 8, 32)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), mel, jnp.zeros((B, 2), jnp.int32))["params"]
        # toy vocab: multilingual special tokens don't fit -> explicit ids
        prompt, eot = [1, 2], cfg.n_vocab - 1

        states = model.apply({"params": params}, mel, method=Whisper.encode)
        want = greedy_decode(model, params, states, cfg, prompt=prompt, max_len=6, eot=eot)

        mesh = make_tp_mesh(n_model=n_model, n_data=n_data)
        sp = shard_params(params, mesh)
        got = tp_decode_fn(model, mesh, cfg, prompt, max_len=6, eot=eot)(sp, mel)
        np.testing.assert_array_equal(np.asarray(got["tokens"]), np.asarray(want["tokens"]))
        err = float(jnp.max(jnp.abs(got["hidden"] - want["hidden"])))
        assert err < 1e-4, err


class TestTPTraining:
    """Megatron-sharded TRAINING: the generic train step (params carried by
    input shardings, global-batch loss shard_map'd over `data`) runs
    unchanged on a (data, model) mesh with TP-sharded encoder params —
    grads/AdamW moments inherit the TP layout, loss and updated params
    match the single-device step."""

    def test_tp_train_step_matches_single_device(self):
        import numpy as np

        from wealy_tpu.losses import clews_loss
        from wealy_tpu.train import make_train_step
        from wealy_tpu.train.state import TrainState, make_optimizer
        from wealy_tpu.train.step import shard_batch

        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=16, n_audio_state=64, n_audio_head=4,
            n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_state=64,
            n_text_head=4, n_text_layer=1,
        )
        from wealy_tpu.models.heads import ProjectionHead

        enc = WhisperEncoder(cfg, dtype=jnp.float32)
        head = ProjectionHead(zdim=16, hidden=(16,), dtype=jnp.float32)
        rng = np.random.default_rng(0)
        B = 8
        mel = jnp.asarray(rng.normal(size=(B, 8, 32)).astype(np.float32))
        enc_p = enc.init(jax.random.PRNGKey(0), mel)["params"]
        h0 = jnp.zeros((B, cfg.n_audio_ctx, cfg.n_audio_state), jnp.float32)
        head_p = head.init(
            jax.random.PRNGKey(1), h0, jnp.ones((B, cfg.n_audio_ctx), bool)
        )["params"]
        params = {"encoder": enc_p, "head": head_p}

        def model_call(p, batch):
            states = enc.apply({"params": p["encoder"]}, batch["emb"])
            mask = jnp.ones(states.shape[:2], bool)
            return head.apply({"params": p["head"]}, states, mask)

        batch = {
            "emb": mel,
            "labels": jnp.asarray(np.repeat(np.arange(B // 2), 2), jnp.int32),
            "ids": jnp.arange(B, dtype=jnp.int32),
        }

        def fresh_state(p):
            tx = make_optimizer(lr=1e-3, warmup_steps=1, max_steps=10)
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=p,
                opt_state=tx.init(p), tx=tx,
            )

        # the train step donates its state: give each run its own buffers
        params_host = jax.device_get(params)
        step1 = make_train_step(head, clews_loss, mesh=None,
                                model_call=model_call)
        new1, logs1 = step1(
            fresh_state(jax.tree_util.tree_map(jnp.asarray, params_host)),
            dict(batch),
        )
        want = jax.device_get(new1.params)

        mesh = make_tp_mesh(n_model=2, n_data=4)
        sp = shard_params(params_host, mesh)  # encoder TP, head replicated
        # moments built FROM the sharded params inherit the TP layout
        state = fresh_state(sp)
        moments = [
            v for p, v in jax.tree_util.tree_flatten_with_path(
                state.opt_state
            )[0]
            if "mlp_fc1" in jax.tree_util.keystr(p)
            and "kernel" in jax.tree_util.keystr(p)
        ]
        assert moments  # adam mu/nu for the TP-split kernel
        for m in moments:
            assert {s.data.shape for s in m.addressable_shards} == {(64, 128)}
        stepm = make_train_step(head, clews_loss, mesh=mesh,
                                model_call=model_call)
        newm, logsm = stepm(state, shard_batch(dict(batch), mesh))
        assert abs(float(logsm["loss"]) - float(logs1["loss"])) < 1e-5
        got = jax.device_get(newm.params)
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(want),
            jax.tree_util.tree_leaves_with_path(got),
        ):
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(ka),
            )
        # updated params keep the TP layout (no silent resharding)
        k2 = newm.params["encoder"]["block_0"]["mlp_fc1"]["kernel"]
        assert {s.data.shape for s in k2.addressable_shards} == {(64, 128)}


class TestTPBf16:
    """bf16 is the production extraction dtype (load_whisper_model). With
    seq >= 256 the fused Pallas MLP would trigger unless gated off: like
    flash_mha, pallas_call has no GSPMD partitioning rule, and the TP mesh
    Megatron-shards mlp_fc1/mlp_fc2 (ADVICE round 2, medium). use_flash=False
    must disable BOTH Pallas paths so bf16 TP runs the partitionable XLA
    einsums."""

    def test_bf16_encoder_seq256_tp_matches_unsharded(self):
        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=256, n_audio_state=64, n_audio_head=4,
            n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_state=64,
            n_text_head=4, n_text_layer=1,
        )
        enc = WhisperEncoder(cfg, dtype=jnp.bfloat16, use_flash=False)
        rng = np.random.default_rng(7)
        mel = jnp.asarray(rng.normal(size=(4, 8, 512)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), mel)["params"]
        assert enc.apply({"params": params}, mel).shape[1] >= 256  # fused-MLP regime

        want = np.asarray(enc.apply({"params": params}, mel), dtype=np.float32)
        mesh = make_tp_mesh(n_model=4, n_data=2)
        sp = shard_params(params, mesh)
        got = np.asarray(tp_encode_fn(enc, mesh)(sp, mel), dtype=np.float32)
        # same XLA path both sides; only reduction grouping differs (bf16)
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)

    def test_use_flash_false_skips_fused_mlp(self, monkeypatch):
        """With use_flash=False the fused Pallas MLP must never be entered
        (it would be unpartitionable under TP)."""
        import wealy_tpu.ops.fused_mlp as fm

        def boom(*a, **k):
            raise AssertionError("fused_mlp entered with use_flash=False")

        monkeypatch.setattr(fm, "fused_mlp", boom)
        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=256, n_audio_state=64, n_audio_head=4,
            n_audio_layer=1, n_vocab=64, n_text_ctx=8, n_text_state=64,
            n_text_head=4, n_text_layer=1,
        )
        enc = WhisperEncoder(cfg, dtype=jnp.bfloat16, use_flash=False)
        mel = jnp.zeros((1, 8, 512), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), mel)["params"]
        enc.apply({"params": params}, mel)  # must not raise
