"""ADA-style differentiable augmentation, applied consistently to images AND
camera poses/focals.

JAX re-design of the reference augmentation (reference: run.py:720-818):
random 2D rotation/scale/translation is applied to the image via an affine
grid sample, and the SAME transform is pushed through the camera model
(pose post-multiplication, focal rescale, screen-space translation of the
camera center) so the generator never sees an inconsistent (image, pose)
pair. Fully traced: probability `p` is a runtime scalar, so ADA's p
adaptation does not trigger recompilation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.ops.grid_sample import grid_sample_2d_zeros_packed
from nerf_from_image_tpu.pose.pose import invert_space


class AugmentTransform(NamedTuple):
    rot: jnp.ndarray  # [B]
    scale: jnp.ndarray  # [B]
    translation: jnp.ndarray  # [B, 2]


def sample_transform(
    key: jax.Array,
    batch_size: int,
    p: jnp.ndarray,
    disable_scale: bool = False,
    dtype=jnp.float32,
) -> AugmentTransform:
    """Draws the per-sample augmentation parameters (reference:
    run.py:724-744)."""
    k_rot, k_rot_m, k_scale, k_scale_m, k_t, k_t_m = jax.random.split(key, 6)
    rot = (jax.random.uniform(k_rot, (batch_size,), dtype) - 0.5) * 2.0 * np.pi
    rot = rot * (jax.random.uniform(k_rot_m, (batch_size,), dtype) < p)

    if disable_scale:
        scale = jnp.ones((batch_size,), dtype)
    else:
        scale = jnp.exp2(jax.random.normal(k_scale, (batch_size,), dtype) * 0.2)
        keep = (jax.random.uniform(k_scale_m, (batch_size,), dtype) < p).astype(
            dtype
        )
        scale = 1.0 + (scale - 1.0) * keep

    translation = jax.random.normal(k_t, (batch_size, 2), dtype) * 0.1
    t_keep = (
        jax.random.uniform(k_t_m, (batch_size, 1), dtype) < p
    ).astype(dtype)
    translation = translation * t_keep
    return AugmentTransform(rot, scale, translation)


def _affine_mat(tform: AugmentTransform) -> jnp.ndarray:
    """[B, 2, 3] torch-affine_grid matrix (rotation + translation, unscaled)."""
    c, s = jnp.cos(tform.rot), jnp.sin(tform.rot)
    tx, ty = tform.translation[:, 0], tform.translation[:, 1]
    row0 = jnp.stack((c, -s, tx), axis=-1)
    row1 = jnp.stack((s, c, -ty), axis=-1)
    return jnp.stack((row0, row1), axis=-2)


def augment_image(
    img: jnp.ndarray,
    tform: AugmentTransform,
    white_background: bool,
) -> jnp.ndarray:
    """Applies the affine transform to [B, H, W, C] images
    (zeros padding outside, white-background adjustment)."""
    B, H, W, C = img.shape
    mat = _affine_mat(tform)
    mat_scaled = mat * tform.scale[:, None, None]
    # Rotate the scaled translation column by the unscaled rotation.
    t_rot = jnp.einsum("bij,bj->bi", mat[:, :2, :2], mat_scaled[:, :, 2])
    mat_scaled = jnp.concatenate(
        (mat_scaled[:, :, :2], t_rot[:, :, None]), axis=-1
    )

    # affine_grid, align_corners=False: output pixel centers in [-1, 1].
    xs = (2.0 * jnp.arange(W, dtype=img.dtype) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H, dtype=img.dtype) + 1.0) / H - 1.0
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    base = jnp.stack((gx, gy, jnp.ones_like(gx)), axis=-1).reshape(-1, 3)
    coords = jnp.einsum("bij,nj->bni", mat_scaled, base)  # [B, H*W, 2]

    if white_background:
        img = img - 1.0
    # One corner-packed gather per output pixel (identical arithmetic to the
    # reference's 4-corner grid_sample; 1/4 the gather+scatter rows).
    out = grid_sample_2d_zeros_packed(img, coords).reshape(B, H, W, C)
    if white_background:
        out = out + 1.0
    return out


def augment_pose(
    pose: jnp.ndarray,
    focal: Optional[jnp.ndarray],
    tform: AugmentTransform,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Applies the same 2D transform to the camera (reference:
    run.py:771-795)."""
    mat = _affine_mat(tform)
    B = pose.shape[0]
    M = jnp.broadcast_to(jnp.eye(4, dtype=pose.dtype), (B, 4, 4))
    M = M.at[:, :2, :2].set(mat[:, :2, :2])
    pose_new = pose @ jnp.swapaxes(M, -2, -1)
    if focal is not None:
        focal_new = focal / tform.scale
    else:
        focal_new = None
        scale = tform.scale[:, None, None]
        pose_new = jnp.concatenate(
            (
                jnp.concatenate(
                    (pose_new[:, :3, :3] * scale, pose_new[:, :3, 3:]), axis=-1
                ),
                jnp.concatenate(
                    (pose_new[:, 3:, :3], pose_new[:, 3:, 3:] * scale), axis=-1
                ),
            ),
            axis=-2,
        )

    pose_orig = pose_new
    cam_inv = invert_space(pose_new)
    if focal is not None:
        shift = tform.translation * (
            -cam_inv[:, 2:3, 3] / (2.0 * focal_new[:, None])
        )
    else:
        shift = tform.translation * pose_orig[:, 3:4, 3]
    cam_inv = cam_inv.at[:, :2, 3].add(-shift)
    pose_new = invert_space(cam_inv)
    if focal is None:
        pose_new = pose_new.at[:, :3, :3].multiply(pose_orig[:, 3:4, 3:4])
        pose_new = pose_new.at[:, 3, 3].multiply(pose_orig[:, 3, 3])
    return pose_new, focal_new


def augment(
    key: jax.Array,
    img: Optional[jnp.ndarray],
    pose: Optional[jnp.ndarray],
    focal: Optional[jnp.ndarray],
    p: jnp.ndarray,
    white_background: bool,
    disable_scale: bool = False,
    tform: Optional[AugmentTransform] = None,
):
    """Samples (or reuses) a transform and applies it to image and camera."""
    bs = img.shape[0] if img is not None else pose.shape[0]
    if tform is None:
        tform = sample_transform(key, bs, p, disable_scale)
    img_new = (
        augment_image(img, tform, white_background) if img is not None else None
    )
    if pose is not None:
        pose_new, focal_new = augment_pose(pose, focal, tform)
    else:
        pose_new, focal_new = None, focal
    return img_new, pose_new, focal_new, tform
