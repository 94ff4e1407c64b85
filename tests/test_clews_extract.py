"""Tests for the CLEWS acoustic extraction path (audio -> CQT -> window
encoder -> hs_clews trio in the store)."""

import numpy as np
import pandas as pd
import pytest

from wealy_tpu.models.clews_extract import extract_clews_split, make_clews_extractor


@pytest.fixture(scope="module")
def extractor():
    # tiny windows/encoder keep CPU cost low
    return make_clews_extractor(
        n_windows=8, frames_per_window=4, embed_dim=32,
        encoder_kwargs=dict(stem=8, stages=((8, 2),), blocks_per_stage=1),
    )


class TestExtractor:
    def test_shapes_and_mask(self, extractor):
        # 8 windows x 4 frames x hop 512 = 16384 samples full span
        audio = np.random.default_rng(0).normal(size=6000).astype(np.float32)
        out = extractor(audio)
        assert out["hs_clews"].shape == (8, 32)
        assert out["hs_clews_avg"].shape == (32,)
        assert out["hs_clews_mask"].shape == (8,)
        # 6000 samples / (4*512) per window -> 3 valid windows
        assert (~out["hs_clews_mask"]).sum() == 3
        np.testing.assert_allclose(
            out["hs_clews_avg"], out["hs_clews"][:3].mean(axis=0), rtol=1e-5
        )

    def test_long_audio_cropped(self, extractor):
        audio = np.random.default_rng(1).normal(size=100_000).astype(np.float32)
        out = extractor(audio)
        assert not out["hs_clews_mask"].any()  # all 8 windows valid

    def test_deterministic(self, extractor):
        audio = np.random.default_rng(2).normal(size=8000).astype(np.float32)
        a = extractor(audio)["hs_clews"]
        b = extractor(audio)["hs_clews"]
        np.testing.assert_array_equal(a, b)


class TestSplitExtraction:
    def test_writes_trio_and_resumes(self, tmp_path, monkeypatch, extractor):
        from wealy_tpu.data.embedding_store import EmbeddingStore
        from wealy_tpu.data.metadata import load_lyric_covers
        from wealy_tpu.train.config import Config

        lc = tmp_path / "lc"
        lc.mkdir()
        rows = {"train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
                "val": [], "test": []}
        for split, data in rows.items():
            pd.DataFrame(
                data, columns=["original_id", "id", "is_cover", "song_text_type", "label"]
            ).to_csv(lc / f"{split}_no_dup.csv", index=False)
        md = load_lyric_covers(lc)

        import wealy_tpu.data.audio_dataset as AD

        monkeypatch.setattr(AD, "find_audio_path", lambda ds, root, key: key)
        monkeypatch.setattr(
            AD, "load_audio",
            lambda path, sr=16000: np.random.default_rng(int(str(path))).normal(
                size=7000
            ).astype(np.float32),
        )

        config = Config.from_dict({
            "path": {"lyric_covers_data": str(lc), "hidden_states": str(tmp_path / "hs"),
                     "data": str(tmp_path / "data")},
            "data": {"dataset_name": "lyric-covers"},
        })
        result = extract_clews_split(config, md, "train", extractor=extractor)
        assert sorted(result["done"]) == ["100", "101"] and not result["failed"]
        store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
        assert store.load("100", "hs_clews.npz")["embeddings"].shape == (8, 32)
        assert store.load("100", "hs_clews_mask.npz")["embeddings"].dtype == bool
        # resume
        r2 = extract_clews_split(config, md, "train", extractor=extractor)
        assert len(r2["skipped"]) == 2 and not r2["done"]
