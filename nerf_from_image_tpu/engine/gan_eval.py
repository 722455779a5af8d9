"""Training-time evaluation: FID over fixed latents + reconstruction grids.

JAX re-design of the reference evaluate() (reference: run.py:1200-1472):
render the fixed z_fid latents against the eval split's poses, accumulate
Inception activations ON DEVICE, and compute FID against the precomputed
real statistics; optionally PSNR/SSIM grids for recon checks. The render +
inception forward is one jit program per batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.engine.render import RenderConfig, render
from nerf_from_image_tpu.metrics import fid as fid_mod


def compute_real_fid_stats(
    inception_model, inception_vars, images: np.ndarray, batch_size: int = 32,
    resolution: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inception statistics of a real-image split (reference:
    run.py:385-404). images: [N, H, W, C] in [-1, 1] (host array)."""
    fwd = jax.jit(lambda x: inception_model.apply(inception_vars, x))
    acts = []
    n = len(images)
    for i in range(0, n - n % batch_size, batch_size):
        im = jnp.asarray(images[i : i + batch_size, ..., :3]) / 2.0 + 0.5
        acts.append(jax.device_get(fwd(im)))
    if n % batch_size:
        im = jnp.asarray(images[n - n % batch_size:, ..., :3]) / 2.0 + 0.5
        acts.append(jax.device_get(fwd(im)))
    activations = jnp.asarray(np.concatenate(acts))
    return fid_mod.calculate_stats(activations)


def make_fid_eval_fn(
    render_config: RenderConfig,
    model,
    inception_model,
    inception_vars,
):
    """Jittable: (generator variables, z batch, pose batch) -> activations."""

    def eval_batch(variables, z, pose, focal, center=None, bbox=None):
        out, _ = render(
            render_config, model, variables, pose, focal, z,
            center=center, bbox=bbox,
        )
        img = jnp.clip(out.rgb[..., :3], -1.0, 1.0) / 2.0 + 0.5
        return inception_model.apply(inception_vars, img)

    return eval_batch


def evaluate_fid(
    eval_batch_fn,
    variables,
    z_fid: np.ndarray,
    split,
    eval_indices: np.ndarray,
    real_stats,
    batch_size: int = 32,
) -> Dict[str, float]:
    """Renders the eval subset and returns {'fid': value} (reference FID
    protocol: <= 8000 images, run.py:413-439)."""
    acts = []
    n = len(eval_indices)
    for i in range(0, n - n % batch_size, batch_size):
        idx = eval_indices[i : i + batch_size]
        sel = split.select(idx)
        acts.append(
            jax.device_get(
                eval_batch_fn(
                    variables,
                    jnp.asarray(z_fid[i : i + batch_size]),
                    jnp.asarray(sel.tform_cam2world),
                    jnp.asarray(sel.focal_length)
                    if sel.focal_length is not None
                    else None,
                    jnp.asarray(sel.center) if sel.center is not None else None,
                    jnp.asarray(sel.bbox) if sel.bbox is not None else None,
                )
            )
        )
    activations = jnp.asarray(np.concatenate(acts))
    mu, sigma = fid_mod.calculate_stats(activations)
    value = float(
        fid_mod.frechet_distance(mu, sigma, real_stats[0], real_stats[1])
    )
    return {"fid": value, "n_images": len(activations)}
