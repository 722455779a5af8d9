"""Host-side image export helpers (demo composites).

The reference saves demo composites with torchvision save_image(nrow=1)
over horizontally pre-concatenated panels (reference: run.py:2144-2159,
demo_nusc.py side-by-side outputs); here a grid is assembled in numpy and
written with imageio.
"""

from __future__ import annotations

import os

import numpy as np


def save_image_grid(rows, path: str):
    """Saves a grid of [-1, 1] float images.

    Args:
      rows: list of rows; each row is a list of [H, W, 3] arrays in
        [-1, 1] concatenated horizontally. Rows are stacked vertically
        (one sample per row, panels side by side — the reference's
        nrow=1 layout).
      path: output file; parent directories are created.
    """
    import imageio.v2 as imageio

    grid = np.concatenate(
        [np.concatenate([np.asarray(p) for p in r], axis=1) for r in rows],
        axis=0,
    )
    grid = np.clip((grid + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, grid)
    print("Saving demo output to", path)


def normals_panel(normals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Normal map -> displayable [-1, 1] RGB panel (zeros outside mask)."""
    return np.asarray(normals) * np.asarray(mask)[..., None]
