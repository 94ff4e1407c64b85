"""End-to-end extraction benchmark INCLUDING the host data plane (round-3
VERDICT item 6: every headline number was device-only — bench.py synthesizes
audio in RAM).

Pipeline measured: audio files on disk -> native decode (libmpg123 mp3 /
C++ wav, n_workers swept) -> 30 s chunking -> fused Pallas mel -> bf16
Whisper encoder -> mean pool -> `--pack-direct` PackWriter sink. This is
exactly `extract --batched --pack-direct` (cli/main.py) with a synthetic
corpus in the discogs-vi on-disk layout ({data}/DiscogsVI/audio/{key}.mp3).

Stages reported:
  1. host-only: drain `_chunk_stream` (decode+chunk, no device) per
     n_workers -> chunks/s the 1-core host can feed;
  2. end-to-end: `extract_split_batched` with the real tiny encoder on the
     chip + pack-direct sink -> sustained clips/s;
  3. where the bound sits: host rate vs the device-only rate (bench.py
     ~1600 clips/s at tiny B=256) and the host core count that would
     saturate one chip.

Fixture mp3s are encoded with the system libmp3lame via ctypes (encode is
fixture-only; the framework itself never encodes) — falls back to WAV if
lame is absent.

    python benchmarks/bench_e2e_extract.py [n_songs] [duration_s] [workers,...]
"""
import ctypes
import ctypes.util
import json
import shutil
import sys
import tempfile
import time
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wealy_tpu.cli.main import _apply_platform_env

_apply_platform_env()  # honor JAX_PLATFORMS=cpu (env alone is not; see conftest)

from wealy_tpu.data.metadata import Metadata
from wealy_tpu.train.config import Config

SR = 16000


def _lame():
    for name in (
        "libmp3lame.so.0", "libmp3lame.so",
        ctypes.util.find_library("mp3lame"),
    ):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def encode_mp3(lame, x: np.ndarray, sr: int) -> bytes:
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, ctypes.c_int(sr))
    lame.lame_set_num_channels(gfp, ctypes.c_int(1))
    lame.lame_set_mode(gfp, ctypes.c_int(3))  # MONO
    lame.lame_set_brate(gfp, ctypes.c_int(64))
    assert lame.lame_init_params(gfp) >= 0
    n = len(x)
    buf = (ctypes.c_ubyte * (int(1.25 * n) + 7200))()
    xf = np.ascontiguousarray(x, np.float32)
    m = lame.lame_encode_buffer_ieee_float(
        gfp,
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n), buf, ctypes.c_int(len(buf)),
    )
    assert m >= 0
    tail = (ctypes.c_ubyte * 7200)()
    t = lame.lame_encode_flush(gfp, tail, ctypes.c_int(len(tail)))
    lame.lame_close(gfp)
    return bytes(buf[:m]) + bytes(tail[:t])


def write_wav(path: Path, x: np.ndarray, sr: int) -> None:
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 0.5 * 32767).astype("<i2").tobytes())


def build_corpus(root: Path, n_songs: int, duration_s: float, file_sr: int = 44100):
    """Synthetic discogs-vi corpus on disk; returns (config, metadata).

    ``file_sr`` defaults to 44.1 kHz — the real corpora's rate — so the
    measured host plane includes the native polyphase resample to 16 kHz,
    not just decode."""
    lame = _lame()
    ext = "mp3" if lame is not None else "wav"
    audio_dir = root / "data" / "DiscogsVI" / "audio"
    audio_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t = np.arange(int(duration_s * file_sr)) / file_sr
    info, splits = {}, {"train": {}, "val": {}, "test": {}}
    total_bytes = 0
    for i in range(n_songs):
        x = (
            0.3 * np.sin(2 * np.pi * (200 + 17 * i) * t)
            + 0.05 * rng.standard_normal(t.shape)
        ).astype(np.float32)
        key = f"s{i:05d}"
        p = audio_dir / f"{key}.{ext}"
        if ext == "mp3":
            p.write_bytes(encode_mp3(lame, x, file_sr))
        else:
            write_wav(p, x, file_sr)
        total_bytes += p.stat().st_size
        clique = f"c{i // 2}"
        info[key] = {
            "id": i, "clique": clique, "clique_idx": i // 2,
            "version_idx": i, "filename": key, "version_key": key,
        }
        splits["train"].setdefault(clique, []).append(key)
    md = Metadata("discogs-vi", info, splits)
    config = Config.from_dict({
        "path": {
            "data": str(root / "data"),
            "hidden_states": str(root / "hs"),
            "cache": str(root / "cache"),
        },
        "data": {"dataset_name": "discogs-vi"},
        "model": {"name": "whisper", "whisper_size": "tiny"},
    })
    print(json.dumps({
        "corpus": {
            "n_songs": n_songs, "duration_s": duration_s, "format": ext,
            "file_sr": file_sr,
            "disk_mb": round(total_bytes / 1e6, 1),
            "chunks_per_song": int(np.ceil(duration_s / 30)),
        }
    }), flush=True)
    return config, md


def main(n_songs=48, duration_s=180.0, workers=(1, 2, 4, 8), batch_size=128,
         file_sr=44100):
    from wealy_tpu.cli.extract_batched import (
        _chunk_stream,
        extract_split_batched,
        make_encoder_embed_fn,
    )
    from wealy_tpu.data.audio_dataset import AudioDataset
    from wealy_tpu.data.packed_store import PackWriter

    root = Path(tempfile.mkdtemp(prefix="e2ebench_"))
    try:
        config, md = build_corpus(root, n_songs, duration_s, file_sr=file_sr)
        ds = AudioDataset(md, "train", config.path.data)
        # mp3 decode adds lame priming/padding samples, so each song may
        # ceil to one extra 30 s chunk; stage 1 establishes the true count
        nominal = n_songs * int(np.ceil(duration_s / 30))
        n_chunks_total = None

        # stage 1: host-only decode+chunk rate per worker count
        host_rates = {}
        for w in workers:
            t0 = time.perf_counter()
            n = sum(1 for _ in _chunk_stream(ds, None, n_workers=w))
            dt = time.perf_counter() - t0
            assert nominal <= n <= nominal + n_songs, (n, nominal)
            n_chunks_total = n
            host_rates[w] = n / dt
            print(json.dumps({
                "stage": "host_decode", "n_workers": w,
                "chunks_per_s": round(n / dt, 1),
                "wall_s": round(dt, 1),
            }), flush=True)

        # stage 2: end-to-end on-chip with pack-direct sink
        embed_fn = make_encoder_embed_fn(config)
        best_w = max(host_rates, key=host_rates.get)
        # pre-warm the jit (remote compile is minutes through the tunnel and
        # would otherwise dominate the sustained-throughput measurement)
        t0 = time.perf_counter()
        embed_fn(np.zeros((batch_size, SR * 30), np.float32))
        print(json.dumps({
            "stage": "compile", "wall_s": round(time.perf_counter() - t0, 1)
        }), flush=True)
        writer = PackWriter(
            config.path.hidden_states, "x_concat", dataset_name="discogs-vi"
        )
        try:
            t0 = time.perf_counter()
            result = extract_split_batched(
                config, md, "train", embed_fn,
                kind="x_concat", batch_size=batch_size,
                n_workers=best_w,
                sink=lambda v, **a: writer.add(v, a["embeddings"]),
                skip_fn=lambda v: v in writer,
                log=lambda *_: None,
            )
            dt = time.perf_counter() - t0
            packed = writer.close()
        except BaseException:
            writer.abort()
            raise
        assert len(result["done"]) == n_songs and len(packed) == n_songs
        e2e_rate = n_chunks_total / dt
        print(json.dumps({
            "stage": "end_to_end", "n_workers": best_w,
            "batch_size": batch_size,
            "clips_per_s": round(e2e_rate, 1),
            "wall_s": round(dt, 1),
            "compile_included": True,
        }), flush=True)

        device_only = 1600.0  # bench.py tiny B=256, BENCH_r03 1598.9
        print(json.dumps({
            "stage": "bound_analysis",
            "host_chunks_per_s_1w": round(host_rates.get(1, 0.0), 1),
            "host_chunks_per_s_best": round(host_rates[best_w], 1),
            "device_only_clips_per_s": device_only,
            "host_bound_fraction": round(
                host_rates[best_w] / device_only, 3
            ),
            "cores_to_saturate_chip": round(
                device_only / host_rates.get(1, 1.0), 1
            ),
        }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    d = float(sys.argv[2]) if len(sys.argv) > 2 else 180.0
    ws = (
        tuple(int(w) for w in sys.argv[3].split(","))
        if len(sys.argv) > 3 else (1, 2, 4, 8)
    )
    fsr = int(sys.argv[4]) if len(sys.argv) > 4 else 44100
    main(n_songs=n, duration_s=d, workers=ws, file_sr=fsr)
