"""ctypes bindings for the native host data plane (wealy_host.cpp).

Compiles the shared library on first use (g++, cached next to the source with
an mtime check) and exposes numpy-facing wrappers. Every entry point has a
pure-Python fallback elsewhere in the package (wealy_tpu.audio.decode /
resample), so the framework degrades gracefully when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "wealy_host.cpp"
_BUILD_DIR = Path(__file__).parent / "_build"
_LIB = _BUILD_DIR / "libwealy_host.so"

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _BUILD_DIR.mkdir(exist_ok=True)
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-march=native",  # AVX2/FMA paths in resample_poly
                    "-shared",
                    "-fPIC",
                    "-std=c++17",
                    str(_SRC),
                    "-o",
                    str(_LIB),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.wav_info.argtypes = [
            u8p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_decode.argtypes = [u8p, ctypes.c_uint64, f32p]
        lib.wav_decode.restype = ctypes.c_int
        lib.resample_poly.argtypes = [
            f32p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, f32p, ctypes.c_uint64,
        ]
        lib.resample_poly.restype = ctypes.c_int
        lib.pack_chunks.argtypes = [
            f32p, ctypes.c_uint64, ctypes.c_uint64, f32p, ctypes.c_uint64,
        ]
        lib.pack_chunks.restype = ctypes.c_int
        lib.mp3_available.argtypes = []
        lib.mp3_available.restype = ctypes.c_int
        lib.mp3_decode_alloc.argtypes = [
            u8p, ctypes.c_uint64,
            ctypes.POINTER(f32p),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.mp3_decode_alloc.restype = ctypes.c_int
        lib.wealy_free.argtypes = [ctypes.c_void_p]
        lib.wealy_free.restype = None
        _lib = lib
        return lib
    except (subprocess.CalledProcessError, OSError) as e:
        _build_error = str(e)
        return None


def available() -> bool:
    return _ensure_built() is not None


def _u8(buf: bytes):
    arr = np.frombuffer(buf, dtype=np.uint8)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr


def decode_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono waveform, sample_rate). Raises ValueError
    on malformed/unsupported input."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    ptr, keepalive = _u8(data)
    n = ctypes.c_uint64()
    sr = ctypes.c_uint32()
    rc = lib.wav_info(ptr, len(data), ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"wav_info failed (code {rc})")
    out = np.empty(n.value, np.float32)
    rc = lib.wav_decode(ptr, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"wav_decode failed (code {rc})")
    return out, int(sr.value)


def mp3_available() -> bool:
    """True when libmpg123 is loadable (the native mp3 decode path)."""
    lib = _ensure_built()
    return lib is not None and bool(lib.mp3_available())


def decode_mp3_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """MP3 bytes -> (float32 mono waveform, sample_rate), via the native
    libmpg123 path (wealy_host.cpp::mp3_decode_alloc). Raises RuntimeError
    when the native library or libmpg123 is unavailable, ValueError on
    malformed input."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    ptr, keepalive = _u8(data)
    out_p = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_uint64()
    sr = ctypes.c_uint32()
    rc = lib.mp3_decode_alloc(
        ptr, len(data), ctypes.byref(out_p), ctypes.byref(n), ctypes.byref(sr)
    )
    if rc == 1:
        raise RuntimeError("libmpg123 not available for mp3 decode")
    if rc != 0:
        raise ValueError(f"mp3_decode_alloc failed (code {rc})")
    try:
        out = np.ctypeslib.as_array(out_p, shape=(n.value,)).copy()
    finally:
        lib.wealy_free(out_p)
    return out, int(sr.value)


def resample_native(x: np.ndarray, L: int, M: int, taps: np.ndarray) -> np.ndarray:
    """Polyphase resampling with precomputed taps (same formulation as
    wealy_tpu.audio.resample)."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    x = np.ascontiguousarray(x, np.float32)
    taps = np.ascontiguousarray(taps, np.float32)
    out_len = -(-len(x) * L // M)
    out = np.empty(out_len, np.float32)
    rc = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        L,
        M,
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(taps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_len,
    )
    if rc != 0:
        raise ValueError(f"resample_poly failed (code {rc})")
    return out


def pack_chunks_native(x: np.ndarray, chunk: int) -> np.ndarray:
    """(n,) -> (n_chunks, chunk) zero-padded 30 s chunk matrix."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    x = np.ascontiguousarray(x, np.float32)
    n_chunks = max(1, -(-len(x) // chunk))
    out = np.empty((n_chunks, chunk), np.float32)
    rc = lib.pack_chunks(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        chunk,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_chunks,
    )
    if rc != 0:
        raise ValueError(f"pack_chunks failed (code {rc})")
    return out
