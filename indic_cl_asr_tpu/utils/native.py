"""ctypes bindings for the native runtime (native/*.cpp).

Auto-builds native/libindic_native.so with g++ on first use (cached);
every caller has a pure-Python fallback, so a missing toolchain degrades
gracefully. See train/metrics.py (edit distance) and data/pipeline.py
(audio batch loading).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libindic_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    srcs = [
        os.path.join(_NATIVE_DIR, "editdistance.cpp"),
        os.path.join(_NATIVE_DIR, "audio_loader.cpp"),
    ]
    if not all(os.path.exists(s) for s in srcs):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", *srcs, "-shared",
             "-lpthread", "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(os.path.join(_NATIVE_DIR, "editdistance.cpp"))
            and os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "editdistance.cpp"))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.edit_distance_i64.restype = ctypes.c_int64
        lib.edit_distance_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.edit_distance_batch_i64.restype = None
        lib.edit_distance_batch_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.load_wav_batch.restype = ctypes.c_int
        lib.load_wav_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def _ids(seq, table: dict) -> np.ndarray:
    return np.asarray(
        [table.setdefault(tok, len(table)) for tok in seq], np.int64
    )


def edit_distance_native(a: list, b: list) -> int | None:
    """Levenshtein via native lib; None if unavailable (caller falls back).
    Token identity is preserved through a shared hash table, so distances
    equal the pure-Python implementation exactly."""
    lib = get_lib()
    if lib is None:
        return None
    table: dict = {}
    aa, bb = _ids(a, table), _ids(b, table)
    pa = aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    pb = bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    return int(lib.edit_distance_i64(pa, len(aa), pb, len(bb)))


def edit_distance_batch(pairs: list[tuple[list, list]],
                        n_threads: int = 8) -> list[int] | None:
    lib = get_lib()
    if lib is None:
        return None
    table: dict = {}
    a_seqs = [_ids(a, table) for a, _ in pairs]
    b_seqs = [_ids(b, table) for _, b in pairs]

    def pack(seqs):
        off = np.zeros(len(seqs) + 1, np.int64)
        for i, s in enumerate(seqs):
            off[i + 1] = off[i] + len(s)
        flat = (
            np.concatenate(seqs) if any(len(s) for s in seqs)
            else np.zeros(0, np.int64)
        ).astype(np.int64)
        return flat, off

    a_flat, a_off = pack(a_seqs)
    b_flat, b_off = pack(b_seqs)
    out = np.zeros(len(pairs), np.int64)
    P = ctypes.POINTER(ctypes.c_int64)
    lib.edit_distance_batch_i64(
        a_flat.ctypes.data_as(P), a_off.ctypes.data_as(P),
        b_flat.ctypes.data_as(P), b_off.ctypes.data_as(P),
        len(pairs), out.ctypes.data_as(P), n_threads,
    )
    return out.tolist()


def load_wav_batch_native(
    paths: list[str], max_samples: int, target_sr: int = 16000,
    n_threads: int = 8,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Decode a batch of WAV files into ([B, max_samples] f32, [B] lens);
    None if the native lib is unavailable. lengths[i] == -1 flags a file
    the decoder could not parse."""
    lib = get_lib()
    if lib is None:
        return None
    flat = b"\0".join(p.encode() for p in paths) + b"\0"
    batch = np.zeros((len(paths), max_samples), np.float32)
    lengths = np.zeros(len(paths), np.int64)
    lib.load_wav_batch(
        flat, len(paths), max_samples, target_sr,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    return batch, lengths
