"""`doctor` diagnostics: backend probe (bounded — a wedged remote tunnel is
REPORTED, not inherited), native-lib status, project checks."""

import json

import numpy as np
import pandas as pd

from wealy_tpu.cli.main import main


def test_doctor_no_config(capsys):
    assert main(["doctor", "--backend-timeout", "60"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["backend"]["ok"]
    assert rep["backend"]["default_backend"] == "cpu"  # tests pin cpu
    assert rep["native"]["host_lib"] in (True, False)


def test_doctor_with_project(tmp_path, capsys):
    lc = tmp_path / "lc"
    lc.mkdir()
    rows = {
        "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
        "val": [], "test": [],
    }
    for split, data in rows.items():
        pd.DataFrame(
            data,
            columns=["original_id", "id", "is_cover", "song_text_type",
                     "label"],
        ).to_csv(lc / f"{split}_no_dup.csv", index=False)
    from wealy_tpu.data.embedding_store import EmbeddingStore

    store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
    for vid in ("100", "101"):
        store.save(vid, "hs_last_seq.npz",
                   embeddings=np.zeros((4, 8), np.float32))
    conf = tmp_path / "c.json"
    conf.write_text(json.dumps({
        "path": {"lyric_covers_data": str(lc),
                 "hidden_states": str(tmp_path / "hs"),
                 "cache": str(tmp_path / "cache"),
                 "data": str(tmp_path / "nonexistent_audio")},
        "data": {"dataset_name": "lyric-covers",
                 "embedding_type": "last_hidden_states",
                 "embedding_format": "concat"},
        "model": {"name": "whisper", "zdim": 8},
    }))
    assert main(["doctor", "--config", str(conf),
                 "--backend-timeout", "60"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    proj = rep["project"]
    assert proj["paths"]["lyric_covers_data"] == "ok"
    assert proj["paths"]["data"] == "missing"
    assert proj["paths"]["checkpoints"] == "unset"
    assert proj["splits"]["train"] == 2
    assert proj["pack"] == {
        "kind": "hs_last_seq", "available": False, "versions": 0
    }
