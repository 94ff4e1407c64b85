"""Tests for the transcribe command: .txt output tree, tokenizer decode,
census, resume-skip."""

import json
import wave

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from wealy_tpu.cli.main import main


def _write_wav(path, seconds=0.5, sr=16000):
    path.parent.mkdir(parents=True, exist_ok=True)
    t = np.arange(int(seconds * sr)) / sr
    x = (np.sin(2 * np.pi * 330 * t) * 0.4 * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture
def project(tmp_path, monkeypatch):
    lc = tmp_path / "lc"
    lc.mkdir()
    rows = {"train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
            "val": [], "test": []}
    for split, data in rows.items():
        pd.DataFrame(
            data, columns=["original_id", "id", "is_cover", "song_text_type", "label"]
        ).to_csv(lc / f"{split}_no_dup.csv", index=False)
    base = tmp_path / "data" / "LyricCovers" / "audio"
    for key in ("100", "101"):
        _write_wav(base / key / f"{key}_audio.mp3")

    import wealy_tpu.data.audio_dataset as AD
    import wealy_tpu.audio.decode as dec

    monkeypatch.setattr(AD, "load_audio", lambda p, sr=16000: dec._decode_wav(str(p))[0])

    # small random whisper
    from wealy_tpu.models.whisper import Whisper, WhisperConfig
    import wealy_tpu.cli.extract as EX

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=2,
        n_audio_layer=1, n_vocab=64, n_text_ctx=16, n_text_state=32,
        n_text_head=2, n_text_layer=1,
    )

    def small_loader(config, hf_checkpoint=None):
        model = Whisper(cfg, dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 80, 3000)), jnp.zeros((1, 2), jnp.int32)
        )["params"]
        return model, params, cfg

    monkeypatch.setattr(EX, "load_whisper_model", small_loader)

    conf = {
        "path": {"lyric_covers_data": str(lc), "cache": str(tmp_path / "cache"),
                 "data": str(tmp_path / "data"), "hidden_states": str(tmp_path / "hs")},
        "data": {"dataset_name": "lyric-covers", "whisper_set": "test_set"},
        "model": {"whisper_size": "tiny"},
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    return tmp_path, cpath, cfg


def test_transcribe_token_ids(project, capsys):
    tmp_path, cpath, cfg = project
    # tiny vocab: greedy decode with random weights emits ids < 64; the model
    # prompt uses token ids valid for this vocab? default_prompt uses real
    # whisper special ids (> 64) — pass language=-1 to shrink prompt, and the
    # small model clamps via argmax over its 64 logits. Prompt ids only embed
    # via take(), so out-of-range ids would gather garbage — instead rely on
    # the model cfg's real sot; for n_vocab=64 the computed sot is invalid, so
    # just verify the command surface with max-len small and expect success
    # because jnp.take clips out-of-range indices.
    rc = main(["transcribe", "--config", str(cpath), "--split", "train",
               "--max-len", "8", "--language", "-1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["done"] == 2 and out["failed"] == 0
    txts = list((tmp_path / "cache" / "transcriptions" / "test_set" / "train").glob("*.txt"))
    assert len(txts) == 2
    # token-id fallback: integers separated by spaces
    body = txts[0].read_text().strip()
    assert all(tok.isdigit() for tok in body.split()) or body == ""
    # census ran (nothing valid for numeric text, but structure present)
    assert out["n_total"] == 2
    assert (tmp_path / "cache" / "transcriptions" ).exists()


def test_transcribe_resume_skip(project, capsys):
    tmp_path, cpath, cfg = project
    main(["transcribe", "--config", str(cpath), "--split", "train",
          "--max-len", "8", "--language", "-1"])
    capsys.readouterr()
    rc = main(["transcribe", "--config", str(cpath), "--split", "train",
               "--max-len", "8", "--language", "-1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["skipped"] == 2 and out["done"] == 0
