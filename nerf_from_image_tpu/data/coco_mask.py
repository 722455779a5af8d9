"""COCO run-length-encoded mask decode/encode.

Drop-in replacement for the pycocotools.mask functions the reference data
layer depends on (reference: data/datasets.py:327 decode,
data/datasets.py:77 encode).  pycocotools is a C extension; this module
pairs a native C codec (data/_native/rle.c, loaded via ctypes) with a
pure-numpy fallback used when the shared object can't be built
(NFI_NO_NATIVE=1 forces the fallback).
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np

from nerf_from_image_tpu.data import _native


def _decode_counts(s: bytes) -> List[int]:
    """Decodes pycocotools' compressed LEB128-style counts string."""
    counts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _encode_counts(counts: List[int]) -> bytes:
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def decode(rle: Dict) -> np.ndarray:
    """RLE dict {'size': [h, w], 'counts': bytes|list} -> [h, w] uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    if _native.lib is not None:
        if isinstance(counts, bytes):
            counts = _native.decode_counts(counts)
        return _native.runs_to_mask(np.asarray(counts, np.int64), h, w)
    if isinstance(counts, bytes):
        counts = _decode_counts(counts)
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    assert total == h * w, (total, h * w)
    # Runs alternate background/foreground, column-major.
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape((w, h)).T.copy()


def encode(mask: np.ndarray) -> Dict:
    """[h, w] {0,1} mask -> compressed RLE dict (column-major runs)."""
    h, w = mask.shape
    if _native.lib is not None:
        runs = _native.mask_to_runs(np.asarray(mask, np.uint8))
        return {"size": [h, w], "counts": _native.encode_counts(runs)}
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    # Run lengths with a leading zero-run if the mask starts with 1.
    change = np.nonzero(np.diff(flat))[0] + 1
    boundaries = np.concatenate(([0], change, [flat.size]))
    runs = np.diff(boundaries).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return {"size": [h, w], "counts": _encode_counts(runs)}
