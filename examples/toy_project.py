"""Build (and optionally run) a self-contained toy wealy_tpu project.

Creates a lyric-covers-layout dataset of synthetic "songs" — sine-wave
audio where versions of the same clique share a base pitch (detuned per
version), so even a random-init dev-size Whisper encoder embeds covers
near each other and retrieval is visibly better than chance — plus a
ready config, then optionally drives the full pipeline:

    python examples/toy_project.py /tmp/toy            # just scaffold
    python examples/toy_project.py /tmp/toy --run      # + extract/train/
                                                       #   evaluate/index/query

Layout it produces (the reference's lyric-covers conventions,
/root/reference/lib/embedding_dataset/metadata_loaders.py:128-166 and
path_manager.py:37-41):

    <root>/csv/{train,val,test}_no_dup.csv   original_id,id,is_cover,
                                             song_text_type,label
    <root>/data/LyricCovers/audio/<id>/<id>_audio.mp3   (WAV bytes are fine —
                                             decode dispatches on content)
    <root>/conf.json                         path.* / data.* / model.* / train.*

Everything runs on CPU (JAX_PLATFORMS=cpu) so the example works on any
machine; drop the env override to use a real TPU.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import struct
import subprocess
import sys
import wave
from pathlib import Path

SR = 16000
SECONDS = 2  # enough for one 30 s padded Whisper window


def write_song(path: Path, base_hz: float, detune: float, seed: int) -> None:
    """A poor man's 'cover': same melody (pitch contour), different tuning."""
    path.parent.mkdir(parents=True, exist_ok=True)
    n = SR * SECONDS
    # four-note arpeggio over the clique's base pitch
    melody = [1.0, 1.25, 1.5, 2.0]
    frames = bytearray()
    for i in range(n):
        note = melody[(i * 4 // n) % 4]
        hz = base_hz * note * (1.0 + detune)
        s = 0.5 * math.sin(2 * math.pi * hz * i / SR)
        s += 0.1 * math.sin(2 * math.pi * (seed % 7 + 1) * 0.5 * i / SR)  # vibrato-ish
        frames += struct.pack("<h", int(30000 * 0.25 * s))
    w = wave.open(str(path), "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(SR)
    w.writeframes(bytes(frames))
    w.close()


def build(root: Path, songs_per_split: int = 8) -> Path:
    csv_dir = root / "csv"
    csv_dir.mkdir(parents=True, exist_ok=True)
    audio_root = root / "data" / "LyricCovers" / "audio"
    next_id = 100
    # disjoint clique labels per split (overlapping val/test cliques would be
    # filtered out, mirroring the reference's overlap filter)
    for si, split in enumerate(("train", "val", "test")):
        rows = []
        n_cliques = max(songs_per_split // 2, 1)
        for c in range(n_cliques):
            label = si * 1000 + c
            base_hz = 220.0 * (2 ** (c / max(n_cliques - 1, 1)))
            for v in range(2):  # two versions (original + cover) per clique
                vid = next_id
                next_id += 1
                rows.append((str(label * 10), str(vid),
                             "True" if v else "False",
                             "cover" if v else "orig", str(label)))
                write_song(
                    audio_root / str(vid) / f"{vid}_audio.mp3",
                    base_hz, detune=0.01 * v, seed=vid,
                )
        with open(csv_dir / f"{split}_no_dup.csv", "w") as f:
            f.write("original_id,id,is_cover,song_text_type,label\n")
            for r in rows:
                f.write(",".join(r) + "\n")

    conf = {
        "path": {
            "data": str(root / "data"),
            "hidden_states": str(root / "hs"),
            "cache": str(root / "cache"),
            "working_dir": str(root),
            "checkpoints": str(root / "ckpt"),
            "lyric_covers_data": str(csv_dir),
        },
        "data": {
            "dataset_name": "lyric-covers",
            "embedding_type": "encoder",
            "embedding_format": "concat",
            "chunk_size": 8,
            "n_per_class": 2,
        },
        # `dev` = untrained 2-layer micro-Whisper: instant to run anywhere.
        # Swap for tiny..large-v3-turbo + --hf-checkpoint for real work.
        "model": {"name": "whisper", "zdim": 32, "whisper_size": "dev"},
        "train": {"loss": "clews", "batch_size": 4, "lr": 1e-3,
                  "max_steps": 20},
    }
    conf_path = root / "conf.json"
    conf_path.write_text(json.dumps(conf, indent=2))
    return conf_path


def run_pipeline(conf_path: Path) -> None:
    env = dict(os.environ, JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    root = conf_path.parent

    def cli(*args: str) -> None:
        cmd = [sys.executable, "-m", "wealy_tpu.cli.main", *args,
               "--config", str(conf_path)]
        print(f"\n$ {' '.join(cmd)}")
        subprocess.run(cmd, check=True, env=env)

    for split in ("train", "val", "test"):
        cli("extract", "--batched", "--split", split)
    cli("validate-data")
    cli("pack")
    cli("train", "--max-steps", "20")
    cli("evaluate", "--split", "test")
    index = root / "serve" / "test.npz"
    index.parent.mkdir(exist_ok=True)
    cli("index", "--split", "test", "--out", str(index))
    # query the index with one of the TEST-corpus songs: itself and its
    # cover (same clique) should top the ranking
    first_test_id = (root / "csv" / "test_no_dup.csv").read_text().splitlines()[1].split(",")[1]
    audio = root / "data" / "LyricCovers" / "audio" / first_test_id / f"{first_test_id}_audio.mp3"
    cli("query", "--index", str(index), "--audio", str(audio), "--k", "3")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root", type=Path, help="project directory to create")
    ap.add_argument("--songs", type=int, default=8,
                    help="songs per split (2 versions per clique)")
    ap.add_argument("--run", action="store_true",
                    help="run extract/train/evaluate/index/query end-to-end")
    args = ap.parse_args()
    conf = build(args.root, args.songs)
    print(f"toy project ready: {args.root}\nconfig: {conf}")
    if args.run:
        run_pipeline(conf)
    else:
        print(
            "next:\n"
            f"  python -m wealy_tpu.cli.main extract --batched "
            f"--split train --config {conf}\n"
            f"  (or rerun with --run to drive the whole pipeline)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
