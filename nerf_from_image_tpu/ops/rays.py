"""Ray generation for perspective and orthographic cameras.

Functional JAX re-design of the reference ray-bundle computation
(reference: lib/nerf_utils.py:28-93). Supports optional per-image principal
point ``center`` and a normalized crop ``bbox`` remapping that lets evaluation
render the cropped view from full-image poses. All shapes are static; the
camera model (perspective vs orthographic) is selected statically by passing
``focal_length=None`` for ortho, so each variant jit-compiles to a single
fused program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def get_ray_bundle(
    height: int,
    width: int,
    focal_length: Optional[jnp.ndarray],
    tform_cam2world: jnp.ndarray,
    bbox: Optional[jnp.ndarray] = None,
    center: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Computes world-space ray origins and directions for a pixel grid.

    Args:
      height, width: image resolution (static).
      focal_length: [B] normalized focal lengths, or None for the
        orthographic camera model.
      tform_cam2world: [B, 4, 4] cam2world matrices (the [3, 3] entry holds
        the inverse ortho scale for orthographic cameras).
      bbox: optional [B, 2, 2] normalized crop box (origin, size) per image.
      center: optional [B, 2] principal point (perspective only).

    Returns:
      (ray_origins, ray_directions), each [B, H, W, 3]. Directions are NOT
      normalized (perspective); callers normalize as needed.
    """
    dtype = tform_cam2world.dtype
    # Pixel grid: ii varies along width (axis 1), jj along height (axis 0).
    ii = jnp.arange(width, dtype=dtype)[None, :] / width  # [1, W]
    jj = jnp.arange(height, dtype=dtype)[:, None] / height  # [H, 1]
    ii = jnp.broadcast_to(ii, (height, width))
    jj = jnp.broadcast_to(jj, (height, width))

    rot = tform_cam2world[:, None, None, :3, :3]  # [B,1,1,3,3]
    t = tform_cam2world[:, None, None, :3, -1]  # [B,1,1,3]

    if focal_length is not None:
        # Perspective projection model.
        if center is not None:
            ii = ii[None] - 0.5 * (2.0 * center[:, 0, None, None] - 1.0) - 0.5
            jj = jj[None] - 0.5 * (2.0 * center[:, 1, None, None] - 1.0) - 0.5
        else:
            ii = ii[None] - 0.5
            jj = jj[None] - 0.5

        if bbox is not None:
            ii = (bbox[:, 1:2, 0, None] * (ii + 0.5) + bbox[:, 0:1, 0, None]) * 0.5
            jj = -(bbox[:, 1:2, 1, None] * (-jj + 0.5) + bbox[:, 0:1, 1, None]) * 0.5

        inv_f = 1.0 / focal_length[:, None, None]
        ii = ii * inv_f
        jj = jj * inv_f

        # Flipped camera convention: look down -z, y up in image is -jj.
        directions = jnp.stack((ii, -jj, -jnp.ones_like(ii)), axis=-1)
        ray_directions = jnp.sum(directions[..., None, :] * rot, axis=-1)
        ray_origins = jnp.broadcast_to(t, ray_directions.shape)
    else:
        # Orthographic projection model: parallel rays along -z of the camera,
        # origins spread across the image plane, scaled by 1 / c2w[3, 3].
        ii = (ii[None] - 0.5) * 2.0
        jj = (jj[None] - 0.5) * 2.0

        if bbox is not None:
            ii = bbox[:, 1:2, 0, None] * (ii / 2.0 + 0.5) + bbox[:, 0:1, 0, None]
            jj = -(bbox[:, 1:2, 1, None] * (-jj / 2.0 + 0.5) + bbox[:, 0:1, 1, None])

        origins = jnp.stack((ii, -jj, jnp.zeros_like(ii)), axis=-1)
        directions = jnp.concatenate(
            (
                jnp.zeros_like(origins[..., :2]),
                -jnp.ones_like(origins[..., :1]),
            ),
            axis=-1,
        )
        ray_origins = jnp.sum(origins[..., None, :] * rot, axis=-1) + t
        inv_scale = tform_cam2world[:, None, None, 3, 3, None]
        ray_directions = jnp.sum(directions[..., None, :] * rot, axis=-1) / inv_scale

    return ray_origins, ray_directions


def normalize_directions(ray_directions: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalizes ray directions along the last axis (torch-style eps clamp)."""
    norm = jnp.linalg.norm(ray_directions, axis=-1, keepdims=True)
    return ray_directions / jnp.maximum(norm, eps)
