"""GCS-aware file I/O (reference: lib/utils.py:23-56).

The reference opens checkpoint/report paths through tf.io.gfile so
experiments can live on `gs://` buckets; same here. Local paths never touch
TensorFlow (the import stays lazy), so the zero-dependency path is the
default. Orbax checkpoints support gs:// natively through TensorStore —
these helpers cover the sidecar files (reports, best_fid.json, npz/txt).
"""

from __future__ import annotations

import contextlib
import io
import os
import pathlib


def is_gcs(path: str) -> bool:
    return str(path).startswith("gs://")


@contextlib.contextmanager
def open_file(path: str, mode: str = "r"):
    """Opens a local or gs:// file (reference: lib/utils.py:23-39)."""
    if is_gcs(path):
        from tensorflow.io import gfile

        with gfile.GFile(path, mode) as f:
            yield io.BytesIO(f.read()) if "r" in mode and "b" in mode else f
    else:
        with open(path, mode) as f:
            yield f


def mkdir(path: str) -> None:
    """mkdir -p for local or gs:// paths (reference: lib/utils.py:41-47)."""
    if is_gcs(path):
        from tensorflow.io import gfile

        gfile.makedirs(path)
    else:
        pathlib.Path(path).mkdir(parents=True, exist_ok=True)


def file_exists(path: str) -> bool:
    """Existence check for local or gs:// paths (lib/utils.py:50-56)."""
    if is_gcs(path):
        from tensorflow.io import gfile

        return gfile.exists(path)
    return os.path.isfile(path)


def replace_file(tmp: str, dst: str) -> None:
    """Atomic-ish rename (write-then-rename checkpoints). GCS has no
    rename; copy+delete preserves the crash-safety direction (the old dst
    survives until the new one is fully written)."""
    if is_gcs(dst) or is_gcs(tmp):
        from tensorflow.io import gfile

        gfile.copy(tmp, dst, overwrite=True)
        gfile.remove(tmp)
    else:
        os.replace(tmp, dst)
