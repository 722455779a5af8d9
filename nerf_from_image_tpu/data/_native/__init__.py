"""ctypes loader for the native RLE codec (rle.c).

Looks for a prebuilt `librle.so` next to this file; if absent, attempts a
one-shot `cc -O2 -shared -fPIC` build (atomic rename, so concurrent
imports race safely).  On any failure `lib` is None and data/coco_mask.py
stays on its pure-numpy path — the native codec is an accelerator, not a
dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rle.c")
_SO = os.path.join(_DIR, "librle.so")

lib = None


def _build() -> bool:
    cc = os.environ.get("CC", "cc")
    tmp = None
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
        os.close(fd)
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=60,
        )
        os.replace(tmp, _SO)
        return True
    except Exception:
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return False


def _load():
    global lib
    if os.environ.get("NFI_NO_NATIVE"):
        return
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        if not _build():
            return
    try:
        handle = ctypes.CDLL(_SO)
    except OSError:
        return

    i64 = ctypes.c_int64
    handle.rle_decode_counts.restype = i64
    handle.rle_decode_counts.argtypes = [
        ctypes.c_char_p, i64, ctypes.POINTER(i64), i64]
    handle.rle_encode_counts.restype = i64
    handle.rle_encode_counts.argtypes = [
        ctypes.POINTER(i64), i64, ctypes.c_char_p, i64]
    handle.rle_runs_to_mask.restype = i64
    handle.rle_runs_to_mask.argtypes = [
        ctypes.POINTER(i64), i64, i64, i64, ctypes.POINTER(ctypes.c_uint8)]
    handle.rle_mask_to_runs.restype = i64
    handle.rle_mask_to_runs.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64, ctypes.POINTER(i64), i64]
    lib = handle


_load()


def _i64_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_counts(s: bytes) -> np.ndarray:
    """Compressed counts string -> int64 run lengths (native)."""
    cap = len(s) + 1  # every run needs >=1 encoded byte
    out = np.empty(cap, np.int64)
    m = lib.rle_decode_counts(s, len(s), _i64_ptr(out), cap)
    if m < 0:
        raise ValueError(f"malformed RLE counts string (code {m})")
    return out[:m]


def encode_counts(counts: np.ndarray) -> bytes:
    """int64 run lengths -> compressed counts string (native)."""
    counts = np.ascontiguousarray(counts, np.int64)
    cap = 13 * max(len(counts), 1)  # ceil(64/5) bytes per count, worst case
    out = ctypes.create_string_buffer(cap)
    n = lib.rle_encode_counts(_i64_ptr(counts), len(counts), out, cap)
    if n < 0:
        raise ValueError("RLE encode overflow")
    return out.raw[:n]


def runs_to_mask(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Run lengths -> row-major [h, w] uint8 mask (native)."""
    counts = np.ascontiguousarray(counts, np.int64)
    out = np.empty((h, w), np.uint8)
    rc = lib.rle_runs_to_mask(_i64_ptr(counts), len(counts), h, w, _u8_ptr(out))
    if rc != 0:
        raise ValueError(f"RLE runs do not cover a {h}x{w} mask")
    return out


def mask_to_runs(mask: np.ndarray) -> np.ndarray:
    """Row-major [h, w] {0,1} mask -> column-major run lengths (native)."""
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    cap = h * w + 1
    out = np.empty(cap, np.int64)
    m = lib.rle_mask_to_runs(_u8_ptr(mask), h, w, _i64_ptr(out), cap)
    if m < 0:
        raise ValueError("RLE run scan overflow")
    return out[:m]
