"""`.pt` interop: the store reads a reference-format torch embedding tree in
place, and exports `.pt` files torch can read back (VERDICT round 1 item 1:
"the repo cannot even read an existing reference embedding tree" — now it
can, in both directions).

Reference formats produced here with torch itself: raw fp16 tensors
(base_dataset.py:226-233) and the hs_wealy_concat dict
(multimodal_dataset.py:104-126).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from wealy_tpu.data.embedding_store import EmbeddingStore, load_pt


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestLoadPt:
    def test_raw_tensor_upcasts(self, tmp_path, rng):
        emb = rng.normal(size=(15, 1280)).astype(np.float16)
        torch.save(torch.from_numpy(emb), tmp_path / "hs_last_seq.pt")
        out = load_pt(tmp_path / "hs_last_seq.pt")
        assert set(out) == {"embeddings"}
        assert out["embeddings"].dtype == np.float32
        np.testing.assert_allclose(out["embeddings"], emb.astype(np.float32))

    def test_wealy_dict_format(self, tmp_path, rng):
        emb = rng.normal(size=(4, 512)).astype(np.float16)
        payload = {
            "embeddings": torch.from_numpy(emb),
            "chunk_info": [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 0, 3)],
            "extraction_method": "chunked",
        }
        torch.save(payload, tmp_path / "hs_wealy_concat.pt")
        out = load_pt(tmp_path / "hs_wealy_concat.pt")
        assert out["embeddings"].dtype == np.float32
        assert out["chunk_info"].shape == (4, 3)
        assert str(out["extraction_method"]) == "chunked"


class TestStoreInterop:
    def test_reads_reference_tree_lyric_covers(self, tmp_path, rng):
        """A reference embedding tree (flat per-version folders of .pt files)
        is consumable without conversion."""
        emb = rng.normal(size=(9, 64)).astype(np.float16)
        (tmp_path / "12345").mkdir(parents=True)
        torch.save(torch.from_numpy(emb), tmp_path / "12345" / "hs_last_seq.pt")

        store = EmbeddingStore(tmp_path, "lyric-covers")
        assert store.exists("12345", "hs_last_seq.npz")
        got = store.load("12345", "hs_last_seq.npz")
        np.testing.assert_allclose(got["embeddings"], emb.astype(np.float32))

    def test_reads_reference_tree_shs_layout(self, tmp_path, rng):
        emb = rng.normal(size=(5, 32)).astype(np.float16)
        d = tmp_path / "77" / "77-2"
        d.mkdir(parents=True)
        torch.save(torch.from_numpy(emb), d / "x_concat.pt")
        store = EmbeddingStore(tmp_path, "shs")
        got = store.load("77-2", "x_concat.npz")
        np.testing.assert_allclose(got["embeddings"], emb.astype(np.float32))

    def test_npz_preferred_over_pt(self, tmp_path, rng):
        """When both exist, the native .npz wins (no surprise flips)."""
        store = EmbeddingStore(tmp_path, "lyric-covers")
        a = rng.normal(size=(3, 8)).astype(np.float32)
        b = rng.normal(size=(3, 8)).astype(np.float32)
        store.save("v1", "hs_last_seq.npz", embeddings=a)
        torch.save(torch.from_numpy(b.astype(np.float16)), tmp_path / "v1" / "hs_last_seq.pt")
        got = store.load("v1", "hs_last_seq.npz")
        np.testing.assert_allclose(got["embeddings"], a.astype(np.float16).astype(np.float32))

    def test_export_roundtrip_raw(self, tmp_path, rng):
        store = EmbeddingStore(tmp_path, "lyric-covers")
        emb = rng.normal(size=(7, 16)).astype(np.float32)
        p = store.save_pt("900", "hs_last_seq.pt", embeddings=emb)
        # torch reads back the reference format: a raw fp16 tensor
        t = torch.load(p, map_location="cpu", weights_only=True)
        assert isinstance(t, torch.Tensor) and t.dtype == torch.float16
        np.testing.assert_allclose(
            t.float().numpy(), emb.astype(np.float16).astype(np.float32)
        )
        # and our own loader consumes it
        got = store.load("900", "hs_last_seq.npz")
        np.testing.assert_allclose(got["embeddings"], t.float().numpy())

    def test_export_roundtrip_dict(self, tmp_path, rng):
        store = EmbeddingStore(tmp_path, "lyric-covers")
        emb = rng.normal(size=(2, 512)).astype(np.float32)
        info = np.array([[0, 0, 0], [0, 0, 1]], np.int64)
        p = store.save_pt("901", "hs_wealy_concat.pt", embeddings=emb, chunk_info=info)
        obj = torch.load(p, map_location="cpu", weights_only=True)
        assert set(obj) == {"embeddings", "chunk_info"}
        assert obj["embeddings"].dtype == torch.float16

    def test_dataset_pipeline_over_pt_tree(self, tmp_path, rng):
        """EmbeddingDataset consumes a pure-.pt reference tree end-to-end."""
        import pandas as pd

        from wealy_tpu.data.dataset import EmbeddingDataset
        from wealy_tpu.train.config import Config

        lc = tmp_path / "lc"
        lc.mkdir()
        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A"),
                      (2, 200, False, "o", "B"), (2, 201, True, "c", "B")],
            "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
        }
        for split, data in rows.items():
            pd.DataFrame(
                data,
                columns=["original_id", "id", "is_cover", "song_text_type", "label"],
            ).to_csv(lc / f"{split}_no_dup.csv", index=False)
        hs = tmp_path / "hs"
        for data in rows.values():
            for _, vid, *_ in data:
                (hs / str(vid)).mkdir(parents=True, exist_ok=True)
                t = torch.from_numpy(rng.normal(size=(10, 24)).astype(np.float16))
                torch.save(t, hs / str(vid) / "hs_last_seq.pt")

        config = Config.from_dict({
            "path": {"lyric_covers_data": str(lc), "hidden_states": str(hs),
                     "cache": str(tmp_path / "cache")},
            "data": {"dataset_name": "lyric-covers",
                     "embedding_type": "last_hidden_states",
                     "embedding_format": "concat", "chunk_size": 8},
        })
        ds = EmbeddingDataset(config, "train", seed=0)
        label, versions = ds[0]
        assert versions[0][1].shape == (10, 24)
        assert versions[0][1].dtype == np.float32
