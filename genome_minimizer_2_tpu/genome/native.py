"""ctypes bindings for the native (C++) batch-minimization core.

The hot path of the minimizer mode — removal-interval fill + sequence
compaction over millions of bases x thousands of genomes — runs in
native/gm2min.cpp (multithreaded, zero Python-object work per base). Name
matching and FASTA bookkeeping stay in Python. Falls back transparently to
the numpy path when the library can't be built (see minimizer.py).

The library is built on first use with g++ (no pybind11/pip requirements —
the framework's Python<->C++ boundary is plain ctypes over flat buffers).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libgm2min.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = _NATIVE_DIR / "gm2min.cpp"
    if not src.exists():
        return False
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
           str(src), "-o", str(_SO_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:
        logger.warning("native build failed (%s); using numpy fallback", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _SO_PATH.exists() or (
            (_NATIVE_DIR / "gm2min.cpp").exists()
            and (_NATIVE_DIR / "gm2min.cpp").stat().st_mtime > _SO_PATH.stat().st_mtime
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError as e:
            logger.warning("native load failed (%s); using numpy fallback", e)
            _build_failed = True
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.gm2_minimize_batch.argtypes = [
            u8p, ctypes.c_int64, i64p, i64p, ctypes.c_int64, u8p,
            ctypes.c_int64, u8p, i64p, ctypes.c_int,
        ]
        lib.gm2_minimize_batch.restype = ctypes.c_int
        lib.gm2_minimize_to_fasta.argtypes = [
            u8p, ctypes.c_int64, i64p, i64p, ctypes.c_int64, u8p,
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, i64p,
        ]
        lib.gm2_minimize_to_fasta.restype = ctypes.c_int
        lib.gm2_minimize_packed_to_fasta.argtypes = [
            u8p, ctypes.c_int64, i64p, i64p, ctypes.c_int64, u8p,
            ctypes.c_int64, i64p, u8p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            i64p,
        ]
        lib.gm2_minimize_packed_to_fasta.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def minimize_batch(
    seq_bytes: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    drop_mask: np.ndarray,  # (n_samples, F) uint8/bool
    n_threads: int = 0,
) -> list[bytes]:
    """Native batch minimize; returns per-sample minimized byte strings."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    seq_bytes = np.ascontiguousarray(seq_bytes, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    drop = np.ascontiguousarray(drop_mask, np.uint8)
    n, L = drop.shape[0], seq_bytes.shape[0]
    out = np.empty((n, L), np.uint8)
    out_lens = np.zeros(n, np.int64)
    rc = lib.gm2_minimize_batch(seq_bytes, L, starts, ends, starts.shape[0],
                                drop, n, out, out_lens, n_threads)
    if rc != 0:
        raise RuntimeError(f"gm2_minimize_batch failed: rc={rc}")
    return [out[i, : out_lens[i]].tobytes() for i in range(n)]




def _write_base(append: bool, write_base) -> int:
    """Map the Python-side (append, write_base) pair onto the native mode:
    -1 fresh in-place rewrite (exact final size), -2 append at EOF, >= 0
    write the batch at that byte offset (grow-only; the caller truncates at
    stream end). Offset mode exists so chunked streams can rewrite a
    previous output's pages in place instead of re-allocating them (up to
    ~40x on memory-overcommitted hosts — BASELINE.md round 4)."""
    if write_base is not None:
        wb = int(write_base)
        if wb < 0:
            raise ValueError(f"write_base must be >= 0, got {wb}")
        return wb
    return -2 if append else -1


def minimize_to_fasta(
    seq_bytes: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    drop_mask: np.ndarray,
    path: str,
    header_prefix: str,
    start_index: int = 0,
    append: bool = False,
    n_threads: int = 0,
    write_base: int | None = None,
) -> np.ndarray:
    """Native batch minimize writing FASTA records directly; returns lengths.

    Record format matches the reference exactly:
    '>{header_prefix}_{start_index+i+1}\\n{seq}\\n'.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    seq_bytes = np.ascontiguousarray(seq_bytes, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    drop = np.ascontiguousarray(drop_mask, np.uint8)
    out_lens = np.zeros(drop.shape[0], np.int64)
    rc = lib.gm2_minimize_to_fasta(
        seq_bytes, seq_bytes.shape[0], starts, ends, starts.shape[0], drop,
        drop.shape[0], path.encode(), header_prefix.encode(),
        start_index, _write_base(append, write_base), n_threads, out_lens)
    if rc != 0:
        raise RuntimeError(f"gm2_minimize_to_fasta failed: rc={rc}")
    return out_lens


def minimize_packed_to_fasta(
    seq_bytes: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    packed: np.ndarray,      # (n_samples, stride) uint8, little bit order
    col_idx: np.ndarray,     # (F,) int64 — dataset column per feature, -1=none
    ess: np.ndarray,         # (F,) bool/uint8 — essential flags
    path: str,
    header_prefix: str,
    start_index: int = 0,
    append: bool = False,
    n_threads: int = 0,
    write_base: int | None = None,
) -> np.ndarray:
    """Converter-fused native FASTA: the feature drop decision
    (kept iff bit(col_idx) set or essential) runs inside the minimize
    workers straight off the PACKED presence bitmasks — the host never
    materializes unpacked masks (8x smaller stream than the staged path;
    byte-identical output)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    seq_bytes = np.ascontiguousarray(seq_bytes, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    packed = np.ascontiguousarray(packed, np.uint8)
    col_idx = np.ascontiguousarray(col_idx, np.int64)
    ess = np.ascontiguousarray(ess, np.uint8)
    n = packed.shape[0]
    out_lens = np.zeros(n, np.int64)
    rc = lib.gm2_minimize_packed_to_fasta(
        seq_bytes, seq_bytes.shape[0], starts, ends, starts.shape[0],
        packed, packed.shape[1], col_idx, ess, n, path.encode(),
        header_prefix.encode(), start_index,
        _write_base(append, write_base), n_threads, out_lens)
    if rc != 0:
        raise RuntimeError(f"gm2_minimize_packed_to_fasta failed: rc={rc}")
    return out_lens
