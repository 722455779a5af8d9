"""Pose-conditioned StyleGAN2 discriminator.

JAX/flax re-design of the reference discriminator (reference:
models/discriminator.py:21-80): the conditioning vector concatenates a
13-dim pose encoding (z0, t2, s, R flattened — lib/pose_utils.py:133-157)
with optional image/class embeddings, feeding a projection-conditioned
StyleGAN2 backbone.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from nerf_from_image_tpu.models.generator import ResidualEncoder
from nerf_from_image_tpu.models.stylegan import DiscriminatorBackbone
from nerf_from_image_tpu.pose.pose import matrix_to_conditioning_vector


class Discriminator(nn.Module):
    resolution: int
    nc: int
    camera_flipped: bool
    conditional_pose: bool = True
    use_encoder: bool = False
    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x, pose=None, image=None, focal=None, label=None):
        """x: [B, H, W, nc] images in [-1, 1]; pose: [B, 4, 4] cam2world."""
        cond_parts = []
        if self.num_classes:
            emb = nn.Embed(self.num_classes, 512, name="label_embedding")
            cond_parts.append(emb(label))
        elif self.use_encoder:
            cond_parts.append(ResidualEncoder(3, 256, name="emb")(image))
        if self.conditional_pose:
            cond_parts.append(
                matrix_to_conditioning_vector(pose, focal, self.camera_flipped)
            )

        c_dim = 0
        if self.conditional_pose:
            c_dim += 13
        if self.use_encoder:
            c_dim += 512
        if self.num_classes:
            c_dim += 512

        cond = jnp.concatenate(cond_parts, axis=-1) if cond_parts else None
        return DiscriminatorBackbone(
            c_dim, self.resolution, self.nc, name="backbone"
        )(x, cond)
