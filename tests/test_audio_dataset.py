"""Tests for the raw-audio dataset stack over a synthetic WAV fixture tree."""

import wave

import numpy as np
import pandas as pd
import pytest

from wealy_tpu.data.audio_dataset import (
    AudioDataset,
    audio_collate,
    create_audio_loader,
)
from wealy_tpu.data.metadata import load_lyric_covers
from wealy_tpu.data.transcription import TranscriptionCache


def _write_wav(path, seconds, sr=16000, freq=440.0):
    path.parent.mkdir(parents=True, exist_ok=True)
    t = np.arange(int(seconds * sr)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture
def audio_tree(tmp_path, monkeypatch):
    lc = tmp_path / "lc"
    lc.mkdir()
    rows = {
        "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A"),
                  (2, 200, False, "o", "B"), (2, 201, True, "c", "B")],
        "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
        "test": [],
    }
    for split, data in rows.items():
        pd.DataFrame(
            data, columns=["original_id", "id", "is_cover", "song_text_type", "label"]
        ).to_csv(lc / f"{split}_no_dup.csv", index=False)
    md = load_lyric_covers(lc)

    # reference layout probes {version}/{version}_audio.mp3 — we write WAVs and
    # monkeypatch the extension probe by creating mp3-named wav files? No:
    # write real .mp3-named files would need ffmpeg. Instead patch
    # find_audio_path usage by writing wav files and a small shim.
    audio_root = tmp_path / "data"
    base = audio_root / "LyricCovers" / "audio"
    for key in ["100", "101", "200"]:  # 201 deliberately missing
        _write_wav(base / key / f"{key}_audio.mp3.wav", seconds=1.0 + int(key) % 3)

    import wealy_tpu.data.audio_dataset as AD

    real_find = AD.find_audio_path

    def fake_find(ds, root, key):
        p = base / key / f"{key}_audio.mp3.wav"
        return p if p.exists() else None

    monkeypatch.setattr(AD, "find_audio_path", fake_find)

    trans_root = tmp_path / "trans"
    trans_root.mkdir()
    (trans_root / "100.txt").write_text(
        "The quick brown fox jumps over the lazy dog tonight and sings a new song. "
        "Every day brings another melody worth keeping around here."
    )
    (trans_root / "101.txt").write_text("♪♪♪♪♪")
    cache = TranscriptionCache(tmp_path / "tc", "lyric-covers", "turbo", "train")
    cache.build_index(trans_root)
    return md, audio_root, cache


class TestAudioDataset:
    def test_item_fields(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "train", root, transcription_cache=cache)
        assert len(ds) == 4
        idx = ds.versions.index("100")
        item = ds[idx]
        assert item.waveform is not None and item.waveform.ndim == 1
        assert item.has_valid_transcription
        assert item.audio_path is not None
        bad = ds[ds.versions.index("101")]
        assert not bad.has_valid_transcription  # musical symbols

    def test_missing_audio_dummy_silence(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "train", root, transcription_cache=cache)
        item = ds[ds.versions.index("201")]
        np.testing.assert_array_equal(item.waveform, np.zeros(16000, np.float32))
        assert item.audio_path is None

    def test_evaluation_mode_skips_decode(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "train", root, evaluation_mode=True)
        item = ds[0]
        assert item.waveform is None
        tensors = ds.evaluation_tensors()
        assert tensors["clique_idx"].shape == (4,)

    def test_debug_num_cliques(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "train", root, debug_num_cliques=1)
        assert len(ds) == 2

    def test_clique_check(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "train", root)
        report = ds.check_clique_versions()
        assert report["ok"] and report["n_cliques"] == 2  # train split: A, B


class TestAudioCollate:
    def _items(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "train", root, transcription_cache=cache)
        return [ds[i] for i in range(len(ds))]

    def test_pad_and_mask(self, audio_tree):
        items = self._items(audio_tree)
        batch = audio_collate(items)
        B, T = batch["waveforms"].shape
        assert B == 4
        assert T == batch["lengths"].max()
        for i in range(B):
            L = batch["lengths"][i]
            assert batch["attention_mask"][i, :L].all()
            assert not batch["attention_mask"][i, L:].any()

    def test_max_duration_cap(self, audio_tree):
        items = self._items(audio_tree)
        batch = audio_collate(items, enforce_max_duration=True, max_seconds=1)
        assert batch["waveforms"].shape[1] == 16000
        assert batch["lengths"].max() == 16000

    def test_bucketing(self, audio_tree):
        items = self._items(audio_tree)
        batch = audio_collate(items, length_buckets=[16000, 65536, 131072])
        assert batch["waveforms"].shape[1] in (16000, 65536, 131072)

    def test_empty_batch(self):
        batch = audio_collate([])
        assert batch["waveforms"].shape == (0, 0)

    def test_drops_malformed(self, audio_tree):
        from wealy_tpu.data.audio_dataset import AudioItem

        items = self._items(audio_tree)[:2]
        items.append(
            AudioItem(0, 0, None, None, False, None, "broken")
        )
        batch = audio_collate(items)
        assert batch["waveforms"].shape[0] == 2


class TestLoader:
    def test_train_loader_shuffles_and_drops(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "train", root, transcription_cache=cache)
        batches = list(create_audio_loader(ds, batch_size=3, seed=1))
        assert len(batches) == 1  # 4 items, drop_last
        assert batches[0]["waveforms"].shape[0] == 3

    def test_val_loader_keeps_tail(self, audio_tree):
        md, root, cache = audio_tree
        ds = AudioDataset(md, "val", root)
        batches = list(create_audio_loader(ds, batch_size=4))
        assert len(batches) == 1
        assert batches[0]["waveforms"].shape[0] == 2
