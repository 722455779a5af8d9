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


def depth_panel(depth: np.ndarray, mask: np.ndarray,
                white_background: bool) -> np.ndarray:
    """Depth map -> displayable [-1, 1] RGB panel: foreground depths are
    centered on their median and scaled by 5 m; background is white (or
    grey) (reference: eval_nusc_persp.py:566-587)."""
    depth = np.asarray(depth)
    mask = np.asarray(mask)
    fg = depth[mask >= 0.95]
    med = np.median(fg) if fg.size else 0.0
    vis = (depth - med) / 5.0
    vis = np.where(mask < 0.95, 1.0 if white_background else 0.0, vis)
    return np.clip(np.stack([vis] * 3, axis=-1), -1, 1)


def coords_panel(coords: np.ndarray, mask: np.ndarray, scene_range: float,
                 white_background: bool) -> np.ndarray:
    """Encoder NOCS coordinate map -> displayable [-1, 1] RGB panel
    (reference: run.py:2061-2069 / eval_nusc_persp.py:556-565)."""
    mask = np.asarray(mask)[..., None]
    panel = np.clip(np.asarray(coords) * mask / scene_range, -1, 1)
    if white_background:
        panel = panel + (1 - mask)
    return panel
