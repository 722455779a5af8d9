"""Bootstrap encoder: SegFormer backbone -> (canonical coords, mask, w).

JAX re-design of the reference encoder (reference: models/encoder.py:21-103):
a SegFormer-B5 backbone whose 1/4-resolution features feed (a) a conv head
upsampled 4x regressing a 3-channel canonical coordinate map + sigmoid
foreground mask, and (b) a pooled linear head regressing the latent w.
Trained on the frozen generator's own samples (self-supervised distillation,
reference run.py:1521-1706).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_from_image_tpu.models.segformer import (
    Segformer,
    TorchConv,
    TorchLinear,
    _resize_bilinear,
)


class BootstrapEncoder(nn.Module):
    latent_dim: int
    pose_regressor: bool = True
    latent_regressor: bool = True
    separate_backbones: bool = False
    # MiT-B5 stage depths (reference: models/segformer.py depths
    # [3, 6, 40, 3]); overridable so tests can run a tiny backbone.
    backbone_depths: tuple = (3, 6, 40, 3)

    @nn.compact
    def __call__(
        self, x, deterministic: bool = True
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """x: [B, H, W, 3] in [-1, 1] -> (coords [B, H, W, 3],
        mask [B, H, W], w [B, 1, latent_dim])."""
        features = Segformer(
            out_features=512, depths=self.backbone_depths, name="backbone"
        )(x, deterministic)

        coords = mask = w = None
        if self.pose_regressor:
            up = _resize_bilinear(
                features, (features.shape[1] * 4, features.shape[2] * 4)
            )
            up = jax.nn.relu(up)
            h = TorchConv(512, 512, 3, padding=1, name="post_0")(up)
            h = jax.nn.relu(h)
            h = TorchConv(512, 512, 3, padding=1, name="post_2")(h)
            h = jax.nn.relu(h)
            maps = TorchConv(512, 4, 3, padding=1, name="post_4")(h)
            coords = maps[..., :3]
            mask = jax.nn.sigmoid(maps[..., 3])

        if self.latent_regressor:
            if self.separate_backbones:
                features_latent = Segformer(
                    out_features=512, depths=self.backbone_depths,
                    name="backbone_latent"
                )(x, deterministic)
            else:
                features_latent = features
            f = jax.nn.relu(features_latent)
            f = TorchConv(512, 512, 3, padding=1, name="w_regressor_pre_0")(f)
            f = jax.nn.relu(f)
            f = jnp.mean(f, axis=(1, 2))
            f = TorchLinear(512, 512, name="w_regressor_post_0")(f)
            f = jax.nn.relu(f)
            f = TorchLinear(512, self.latent_dim, name="w_regressor_post_2")(f)
            f = jnp.where(f >= 0, f, f * 0.2)  # LeakyReLU(0.2), as mapping net
            w = f[:, None, :]

        return coords, mask, w


def encoder_rename(path: str) -> str:
    """flax param path -> reference encoder state-dict key."""
    from nerf_from_image_tpu.models.segformer import segformer_rename

    out = segformer_rename(path)
    for stem in ("post", "w_regressor_pre", "w_regressor_post"):
        for idx in ("0", "2", "4"):
            out = out.replace(f"{stem}_{idx}.", f"{stem}.{idx}.")
    return out
