"""Golden activation parity: wealy_tpu Whisper vs transformers WhisperModel.

A small random-initialized HF Whisper is the independent reference
implementation; weights convert through params_from_hf_state_dict and
activations must match in f32 (SURVEY.md §4 test strategy, golden-value tier).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wealy_tpu.models.whisper import (
    Whisper,
    WhisperConfig,
    WhisperEncoder,
    WHISPER_CONFIGS,
    greedy_decode,
    params_from_hf_state_dict,
)
from wealy_tpu.models.whisper.generate import default_prompt
from wealy_tpu.models.whisper.model import sinusoids


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig, WhisperModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=100,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=96,  # parity is length-invariant; 1500 costs ~10s/test on 1 CPU core
        max_target_positions=32,
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=99,
        decoder_start_token_id=98,
    )
    hf = WhisperModel(hf_cfg).eval()
    # HF random-inits the encoder position table; align it with the exact
    # host table our encoder's positions param initializes from.
    import numpy as _np

    from wealy_tpu.models.whisper.model import sinusoids

    with torch.no_grad():
        hf.encoder.embed_positions.weight.copy_(
            torch.tensor(_np.asarray(sinusoids(96, 64)))
        )

    cfg = WhisperConfig(
        n_mels=80,
        n_audio_ctx=96,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_vocab=100,
        n_text_ctx=32,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )
    params = params_from_hf_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(1)
    return rng.normal(size=(2, 80, 192)).astype(np.float32) * 0.5


class TestEncoderParity:
    def test_encoder_matches_hf(self, hf_pair, mel):
        import torch

        hf, cfg, params = hf_pair
        model = WhisperEncoder(cfg, dtype=jnp.float32)
        got = np.asarray(model.apply({"params": params["encoder"]}, mel))
        with torch.no_grad():
            want = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
        assert got.shape == want.shape == (2, 96, 64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestDecoderParity:
    def test_teacher_forced_matches_hf(self, hf_pair, mel):
        import torch

        hf, cfg, params = hf_pair
        tokens = np.array([[5, 17, 3, 99, 42], [1, 2, 3, 4, 5]], np.int32)
        model = Whisper(cfg, dtype=jnp.float32)
        hidden, logits = model.apply({"params": params}, mel, tokens)
        with torch.no_grad():
            out = hf(
                torch.tensor(mel), decoder_input_ids=torch.tensor(tokens, dtype=torch.long)
            ).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(hidden), out, rtol=1e-4, atol=1e-4)
        # logits are hidden @ embedding.T
        want_logits = out @ params["decoder"]["token_embedding"].T
        np.testing.assert_allclose(np.asarray(logits), want_logits, rtol=1e-3, atol=1e-3)


class TestIncrementalDecode:
    def test_kv_cache_matches_teacher_forcing(self, hf_pair, mel):
        from wealy_tpu.models.whisper.generate import init_kv_caches

        hf, cfg, params = hf_pair
        model = Whisper(cfg, dtype=jnp.float32)
        enc = model.apply({"params": params}, mel, method=Whisper.encode)
        tokens = np.array([[5, 17, 3, 99, 42], [1, 2, 3, 4, 5]], np.int32)

        # full teacher-forced pass
        hid_full, logits_full = model.apply({"params": params}, mel, tokens)

        # incremental: prefill 3 tokens then 2 single steps
        caches = init_kv_caches(cfg, 2, 8, dtype=jnp.float32)
        hid_a, log_a, caches = model.apply(
            {"params": params}, tokens[:, :3], enc,
            kv_caches=caches, cache_index=0, method=Whisper.decode,
        )
        hid_parts = [np.asarray(hid_a)]
        for t in range(3, 5):
            hid_t, log_t, caches = model.apply(
                {"params": params}, tokens[:, t : t + 1], enc,
                kv_caches=caches, cache_index=t, method=Whisper.decode,
            )
            hid_parts.append(np.asarray(hid_t))
        hid_inc = np.concatenate(hid_parts, axis=1)
        np.testing.assert_allclose(hid_inc, np.asarray(hid_full), rtol=1e-4, atol=1e-4)

    def test_greedy_decode_runs_and_stops(self, hf_pair, mel):
        hf, cfg, params = hf_pair
        model = Whisper(cfg, dtype=jnp.float32)
        enc = model.apply({"params": params}, mel, method=Whisper.encode)
        prompt = [cfg.sot % cfg.n_vocab]  # tiny vocab: use a valid token id
        out = greedy_decode(model, params, enc, cfg, prompt=[7, 8], max_len=16, eot=99)
        assert out["tokens"].shape == (2, 16)
        assert out["hidden"].shape == (2, 16, 64)
        assert out["lengths"].shape == (2,)
        assert int(out["lengths"].min()) >= 2
        # hidden vectors are the decoder states: prefix positions nonzero
        assert np.abs(np.asarray(out["hidden"][:, 0])).sum() > 0

    def test_greedy_matches_hf_manual_loop(self, hf_pair, mel):
        import torch

        hf, cfg, params = hf_pair
        model = Whisper(cfg, dtype=jnp.float32)
        enc = model.apply({"params": params}, mel, method=Whisper.encode)
        prompt = [7, 8]
        max_len = 12
        ours = greedy_decode(model, params, enc, cfg, prompt=prompt, max_len=max_len, eot=99)

        # independent greedy loop on the HF model (logits = hidden @ embed.T)
        embed_w = hf.decoder.embed_tokens.weight.detach()
        ids = torch.tensor([[7, 8], [7, 8]], dtype=torch.long)
        finished = torch.zeros(2, dtype=torch.bool)
        with torch.no_grad():
            enc_t = hf.encoder(torch.tensor(mel)).last_hidden_state
            for _ in range(max_len - len(prompt)):
                h = hf.decoder(
                    input_ids=ids, encoder_hidden_states=enc_t
                ).last_hidden_state
                nxt = (h[:, -1] @ embed_w.T).argmax(-1)
                nxt = torch.where(finished, torch.tensor(99), nxt)
                finished |= nxt == 99
                ids = torch.cat([ids, nxt[:, None]], dim=1)

        got = np.asarray(ours["tokens"])
        want = ids.numpy()[:, :max_len]
        np.testing.assert_array_equal(got, want)


def test_configs_registry():
    assert WHISPER_CONFIGS["tiny"].n_audio_state == 384
    assert WHISPER_CONFIGS["large-v3"].n_mels == 128
    assert WHISPER_CONFIGS["turbo"].n_text_layer == 4
    cfg = WHISPER_CONFIGS["tiny"]
    assert cfg.eot == 50257 and cfg.sot == 50258
    assert cfg.language_token(0) == 50259  # <|en|>


class TestScanLayers:
    def test_scanned_encoder_matches_looped(self, hf_pair, mel):
        from wealy_tpu.models.whisper.convert import stack_block_params

        hf, cfg, params = hf_pair
        looped = WhisperEncoder(cfg, dtype=jnp.float32)
        want = np.asarray(looped.apply({"params": params["encoder"]}, mel))

        scanned = WhisperEncoder(cfg, dtype=jnp.float32, scan_layers=True)
        sp = stack_block_params(params["encoder"], cfg.n_audio_layer)
        got = np.asarray(scanned.apply({"params": sp}, mel))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_converter_scan_flag(self, hf_pair, mel):
        from wealy_tpu.models.whisper import params_from_hf_state_dict

        hf, cfg, _ = hf_pair
        sp = params_from_hf_state_dict(hf.state_dict(), cfg, scan_layers=True)
        assert "blocks" in sp["encoder"] and "block_0" not in sp["encoder"]
        k = sp["encoder"]["blocks"]["block"]["attn"]["q"]["kernel"]
        assert k.shape == (cfg.n_audio_layer, 64, 64)
        scanned = WhisperEncoder(cfg, dtype=jnp.float32, scan_layers=True)
        out = scanned.apply({"params": sp["encoder"]}, mel)
        import torch

        with torch.no_grad():
            want = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)

    def test_init_shapes_match_stacked(self, hf_pair, mel):
        hf, cfg, params = hf_pair
        scanned = WhisperEncoder(cfg, dtype=jnp.float32, scan_layers=True)
        init_p = scanned.init(jax.random.PRNGKey(0), mel)["params"]
        assert init_p["blocks"]["block"]["attn"]["q"]["kernel"].shape == (
            cfg.n_audio_layer, 64, 64,
        )

    def test_scanned_decoder_matches_looped(self, hf_pair, mel):
        from wealy_tpu.models.whisper.convert import stack_block_params

        hf, cfg, params = hf_pair
        tokens = np.array([[5, 17, 3], [1, 2, 3]], np.int32)
        looped = Whisper(cfg, dtype=jnp.float32)
        enc = looped.apply({"params": params}, mel, method=Whisper.encode)
        want_h, want_l = looped.apply({"params": params}, mel, tokens)

        sp = {
            "encoder": stack_block_params(params["encoder"], cfg.n_audio_layer),
            "decoder": stack_block_params(params["decoder"], cfg.n_text_layer),
        }
        scanned = Whisper(cfg, dtype=jnp.float32, scan_layers=True)
        got_h, got_l = scanned.apply({"params": sp}, mel, tokens)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l), rtol=1e-3, atol=1e-3)

    def test_scanned_greedy_matches_looped(self, hf_pair, mel):
        from wealy_tpu.models.whisper.convert import stack_block_params

        hf, cfg, params = hf_pair
        looped = Whisper(cfg, dtype=jnp.float32)
        enc = looped.apply({"params": params}, mel, method=Whisper.encode)
        want = greedy_decode(looped, params, enc, cfg, prompt=[7, 8], max_len=10, eot=99)

        sp = {
            "encoder": stack_block_params(params["encoder"], cfg.n_audio_layer),
            "decoder": stack_block_params(params["decoder"], cfg.n_text_layer),
        }
        scanned = Whisper(cfg, dtype=jnp.float32, scan_layers=True)
        enc2 = scanned.apply({"params": sp}, mel, method=Whisper.encode)
        got = greedy_decode(scanned, sp, enc2, cfg, prompt=[7, 8], max_len=10, eot=99)
        np.testing.assert_array_equal(np.asarray(got["tokens"]), np.asarray(want["tokens"]))
        np.testing.assert_allclose(
            np.asarray(got["hidden"]), np.asarray(want["hidden"]), rtol=1e-3, atol=1e-4
        )

    def test_scanned_all_hiddens(self, hf_pair, mel):
        from wealy_tpu.models.whisper.convert import stack_block_params

        hf, cfg, params = hf_pair
        tokens = np.array([[5, 17, 3], [1, 2, 3]], np.int32)
        looped = Whisper(cfg, dtype=jnp.float32)
        enc = looped.apply({"params": params}, mel, method=Whisper.encode)
        _, _, want_all = looped.apply(
            {"params": params}, tokens, enc, return_all_hiddens=True, method=Whisper.decode
        )
        sp = {
            "encoder": stack_block_params(params["encoder"], cfg.n_audio_layer),
            "decoder": stack_block_params(params["decoder"], cfg.n_text_layer),
        }
        scanned = Whisper(cfg, dtype=jnp.float32, scan_layers=True)
        _, _, got_all = scanned.apply(
            {"params": sp}, tokens, enc, return_all_hiddens=True, method=Whisper.decode
        )
        np.testing.assert_allclose(
            np.asarray(got_all), np.asarray(want_all), rtol=1e-4, atol=1e-5
        )


class TestCrossKvCache:
    """Precomputed cross-attention K/V (the per-step projection eliminator)
    must be a pure refactor: decode(xa_kv=precomputed) == decode(from
    audio_states), scan and unrolled."""

    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_decode_equivalence(self, scan_layers):
        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=2,
            n_audio_layer=1, n_vocab=64, n_text_ctx=12, n_text_state=32,
            n_text_head=2, n_text_layer=2,
        )
        model = Whisper(cfg, dtype=jnp.float32, scan_layers=scan_layers)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.normal(size=(2, cfg.n_mels, 32)).astype(np.float32))
        tokens = jnp.asarray(rng.integers(0, 64, size=(2, 6)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), mel, tokens)["params"]
        states = model.apply({"params": params}, mel, method=Whisper.encode)

        from wealy_tpu.models.whisper.generate import init_kv_caches

        caches = init_kv_caches(cfg, 2, cfg.n_text_ctx, dtype=jnp.float32)
        want_h, want_l, _ = model.apply(
            {"params": params}, tokens, states,
            kv_caches=caches, cache_index=0, method=Whisper.decode,
        )
        xa_kv = model.apply(
            {"params": params}, states, method=Whisper.precompute_cross_kv
        )
        assert len(xa_kv) == cfg.n_text_layer
        # decode layout: k (B, H, Dh, Tk) pre-scaled, v (B, H, Tk, Dh)
        assert xa_kv[0][0].shape == (2, 2, 16, cfg.n_audio_ctx)
        assert xa_kv[0][1].shape == (2, 2, cfg.n_audio_ctx, 16)
        got_h, got_l, _ = model.apply(
            {"params": params}, tokens, states,
            kv_caches=caches, cache_index=0, xa_kv=xa_kv, method=Whisper.decode,
        )
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l), rtol=1e-6, atol=1e-6)

    def test_greedy_decode_unchanged_by_cache(self):
        """greedy_decode (which now precomputes xa_kv internally) matches a
        manual no-xa_kv decode loop token-for-token."""
        from wealy_tpu.models.whisper.generate import (
            default_prompt,
            greedy_decode,
            init_kv_caches,
        )

        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=2,
            n_audio_layer=1, n_vocab=51865, n_text_ctx=32, n_text_state=32,
            n_text_head=2, n_text_layer=2,
        )
        model = Whisper(cfg, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.normal(size=(1, cfg.n_mels, 32)).astype(np.float32))
        params = model.init(
            jax.random.PRNGKey(1), mel, jnp.zeros((1, 4), jnp.int32)
        )["params"]
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        prompt = default_prompt(cfg, language=0)
        out = greedy_decode(model, params, states, cfg, prompt=prompt, max_len=12)

        # manual reference loop WITHOUT the cross-KV cache
        max_len = 12
        P = len(prompt)
        toks = list(prompt)
        caches = init_kv_caches(cfg, 1, max_len, dtype=jnp.float32)
        buf = jnp.full((1, max_len), cfg.eot, jnp.int32).at[0, :P].set(jnp.asarray(prompt))
        _, logits, caches = model.apply(
            {"params": params}, buf[:, :P], states,
            kv_caches=caches, cache_index=0, method=Whisper.decode,
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        toks.append(nxt)
        i = P
        while nxt != cfg.eot and i < max_len - 1:
            _, logits, caches = model.apply(
                {"params": params}, jnp.asarray([[nxt]], jnp.int32), states,
                kv_caches=caches, cache_index=i, method=Whisper.decode,
            )
            nxt = int(jnp.argmax(logits[0, -1]))
            toks.append(nxt)
            i += 1
        L = int(out["lengths"][0])
        got = np.asarray(out["tokens"])[0, : L + 1].tolist()
        assert got == toks[: L + 1]


class TestF8CrossKv:
    def test_f8_storage_decodes_close(self):
        """Opt-in float8 cross-KV storage: teacher-forced decode stays within
        a few percent of the bf16 path (the -28%%-per-step bandwidth mode)."""
        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=2,
            n_audio_layer=1, n_vocab=64, n_text_ctx=12, n_text_state=32,
            n_text_head=2, n_text_layer=2,
        )
        model = Whisper(cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.normal(size=(2, cfg.n_mels, 32)).astype(np.float32))
        tokens = jnp.asarray(rng.integers(0, 64, size=(2, 6)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), mel, tokens)["params"]
        states = model.apply({"params": params}, mel, method=Whisper.encode)

        from wealy_tpu.models.whisper.generate import init_kv_caches

        xa = model.apply({"params": params}, states, method=Whisper.precompute_cross_kv)
        xa_f8 = [(k.astype(jnp.float8_e4m3fn), v.astype(jnp.float8_e4m3fn)) for k, v in xa]
        caches = init_kv_caches(cfg, 2, cfg.n_text_ctx, dtype=jnp.float32)
        ref_h, ref_l, _ = model.apply(
            {"params": params}, tokens, states,
            kv_caches=caches, cache_index=0, xa_kv=xa, method=Whisper.decode,
        )
        got_h, got_l, _ = model.apply(
            {"params": params}, tokens, states,
            kv_caches=caches, cache_index=0, xa_kv=xa_f8, method=Whisper.decode,
        )
        rel = float(jnp.abs(got_h - ref_h).max() / (jnp.abs(ref_h).max() + 1e-9))
        assert rel < 0.06, rel

    def test_greedy_decode_accepts_cross_kv_dtype(self):
        from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode

        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=2,
            n_audio_layer=1, n_vocab=51865, n_text_ctx=24, n_text_state=32,
            n_text_head=2, n_text_layer=1,
        )
        model = Whisper(cfg, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.normal(size=(1, cfg.n_mels, 32)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(1), mel, jnp.zeros((1, 4), jnp.int32))["params"]
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        out = greedy_decode(
            model, params, states, cfg, prompt=default_prompt(cfg, language=0),
            max_len=10, cross_kv_dtype=jnp.float8_e4m3fn,
        )
        assert out["tokens"].shape == (1, 10)
        assert bool(jnp.isfinite(out["sum_logprob"]).all())


class TestF8SelfKv:
    def _setup(self, dtype=jnp.float32):
        cfg = WhisperConfig(
            n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=2,
            n_audio_layer=1, n_vocab=64, n_text_ctx=16, n_text_state=32,
            n_text_head=2, n_text_layer=2,
        )
        model = Whisper(cfg, dtype=dtype)
        rng = np.random.default_rng(5)
        mel = jnp.asarray(rng.normal(size=(2, cfg.n_mels, 32)).astype(np.float32))
        params = model.init(
            jax.random.PRNGKey(2), mel, jnp.zeros((2, 4), jnp.int32)
        )["params"]
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        return cfg, model, params, states

    def test_f8_cache_incremental_close_to_full_precision(self):
        """float8 SELF-KV storage (round-3 opt-in): incremental decode with
        an f8 cache stays within a few percent of the full-precision cache —
        the cache lives at f8 the whole time (write f8, read f8+upcast)."""
        from wealy_tpu.models.whisper.generate import init_kv_caches

        cfg, model, params, states = self._setup()
        rng = np.random.default_rng(6)
        tokens = jnp.asarray(rng.integers(0, 64, size=(2, 6)), jnp.int32)

        def run(dtype):
            caches = init_kv_caches(cfg, 2, cfg.n_text_ctx, dtype=dtype)
            hs = []
            for i in range(tokens.shape[1]):
                h, _, caches = model.apply(
                    {"params": params}, tokens[:, i : i + 1], states,
                    kv_caches=caches, cache_index=i, method=Whisper.decode,
                )
                assert caches[0][0].dtype == dtype  # cache STAYS at storage
                hs.append(h)
            return jnp.concatenate(hs, axis=1)

        ref = run(jnp.float32)
        got = run(jnp.float8_e4m3fn)
        rel = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
        assert rel < 0.08, rel

    def test_greedy_decode_accepts_self_kv_dtype(self):
        from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode

        cfg, model, params, states = self._setup()
        out = greedy_decode(
            model, params, states, cfg, prompt=[1, 2],
            max_len=10, eot=cfg.n_vocab - 1,
            self_kv_dtype=jnp.float8_e4m3fn,
            cross_kv_dtype=jnp.float8_e4m3fn,
        )
        assert out["tokens"].shape == (2, 10)
        assert bool(jnp.isfinite(out["sum_logprob"]).all())
        assert out["hidden"].shape == (2, 10, cfg.n_text_state)


def test_special_tokens_all_families():
    """Published token layouts: sot/eot are fixed inside each lineage —
    large-v3's <|yue|> lands INSIDE the language block (task tokens shift,
    sot does not); English-only vocabs sit one lower."""
    v2 = WhisperConfig(n_vocab=51865)
    assert (v2.sot, v2.eot, v2.token_transcribe, v2.token_no_timestamps) == (
        50258, 50257, 50359, 50363)
    v3 = WHISPER_CONFIGS["large-v3"]
    assert (v3.sot, v3.eot, v3.n_languages) == (50258, 50257, 100)
    assert (v3.token_transcribe, v3.token_startofprev, v3.token_nospeech,
            v3.token_no_timestamps) == (50360, 50362, 50363, 50364)
    en = WhisperConfig(n_vocab=51864)
    assert (en.sot, en.eot, en.n_languages) == (50257, 50256, 99)
