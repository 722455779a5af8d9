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
    run.py:385-404). images: [N, H, W, C] in [-1, 1] (host array).

    `resolution`: evaluation resolution; when it is half the stored image
    size the reference anti-aliases with a 2x average pool
    (run.py:393-394, evaluation_res == 64) — reproduced here."""

    def prep(x):
        im = jnp.asarray(x[..., :3]) / 2.0 + 0.5
        if resolution is not None and im.shape[1] == 2 * resolution:
            B, H, W, C = im.shape
            im = im.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
        return im

    fwd = jax.jit(lambda x: inception_model.apply(inception_vars, x))
    acts = []
    n = len(images)
    for i in range(0, n - n % batch_size, batch_size):
        acts.append(jax.device_get(fwd(prep(images[i : i + batch_size]))))
    if n % batch_size:
        acts.append(jax.device_get(fwd(prep(images[n - n % batch_size:]))))
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
    for i in range(0, n, batch_size):
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


def make_recon_eval_fn(
    render_config: RenderConfig,
    model,
    inception_model=None,
    inception_vars=None,
    lpips_model=None,
    lpips_vars=None,
):
    """Jittable eval batch for the training-time evaluate() modes
    (reference: run.py:1200-1360): generation (no target) and
    reconstruction front/random (encoder-conditional, target images
    provided). Returns rendered maps, per-sample metrics when a target is
    given, and Inception activations when the model is provided."""

    def eval_batch(variables, z, pose, focal, center=None, bbox=None,
                   image_in=None, target=None, label=None):
        out, _ = render(
            render_config, model, variables, pose, focal, z,
            center=center, bbox=bbox, image=image_in, label=label,
            force_no_cam_grad=True,
        )
        pred = jnp.clip(out.rgb[..., :3], -1.0, 1.0)
        res = {"rgb": pred, "depth": out.depth, "mask": out.mask}
        if target is not None:
            from nerf_from_image_tpu.metrics import image as image_metrics

            res["psnr"] = image_metrics.psnr(
                pred / 2 + 0.5, target[..., :3] / 2 + 0.5, reduction="none"
            )
            res["ssim"] = image_metrics.ssim(
                pred / 2 + 0.5, target[..., :3] / 2 + 0.5, reduction="none"
            )
            if lpips_model is not None:
                res["lpips"] = lpips_model.apply(
                    lpips_vars, pred, target[..., :3]
                ).reshape(-1)
            if target.shape[-1] > 3:
                res["iou"] = image_metrics.iou(
                    out.mask, target[..., 3], reduction="none"
                )
        if inception_model is not None:
            res["activations"] = inception_model.apply(
                inception_vars, pred / 2 + 0.5
            )
        return res

    return eval_batch


def evaluate_recon(
    eval_batch_fn,
    variables,
    z_fid: np.ndarray,
    split,
    eval_indices: np.ndarray,
    real_stats=None,
    batch_size: int = 32,
    recon_mode: Optional[str] = None,
    perm_indices: Optional[np.ndarray] = None,
    views_per_object: Optional[int] = None,
    input_images: Optional[np.ndarray] = None,
    use_labels: bool = False,
) -> Dict[str, object]:
    """Host driver for the training-time evaluate() (reference:
    run.py:1200-1401).

    recon_mode None renders z_fid at the eval poses (generation FID);
    'front' renders at each eval image's own pose and scores against it;
    'random' renders at the paired novel-view pose (scored only when the
    dataset has >1 view per object). `input_images` supplies the
    encoder-conditional image inputs (uncropped train images, indexed by
    the ORIGINAL eval index — reference: run.py:1236-1243).

    Returns mean metrics, 'fid' when real_stats given, and the first
    batch's rendered maps for TensorBoard grids.
    """
    n = len(eval_indices)
    pose_indices = eval_indices
    if recon_mode == "random":
        pose_indices = perm_indices
    score = recon_mode == "front" or (
        recon_mode == "random"
        and views_per_object is not None
        and views_per_object > 1
    )

    acts = []
    sums: Dict[str, float] = {}
    count = 0
    first_batch = None
    for i in range(0, n, batch_size):
        idx = pose_indices[i : i + batch_size]
        sel = split.select(idx)
        target = (
            jnp.asarray(sel.images) if score and sel.images is not None
            else None
        )
        image_in = None
        if input_images is not None:
            image_in = jnp.asarray(
                input_images[eval_indices[i : i + batch_size]][..., :3]
            )
        res = eval_batch_fn(
            variables,
            jnp.asarray(z_fid[i : i + batch_size]),
            jnp.asarray(sel.tform_cam2world),
            jnp.asarray(sel.focal_length)
            if sel.focal_length is not None else None,
            jnp.asarray(sel.center) if sel.center is not None else None,
            jnp.asarray(sel.bbox) if sel.bbox is not None else None,
            image_in,
            target,
            jnp.asarray(sel.classes)
            if use_labels and sel.classes is not None else None,
        )
        res = jax.device_get(res)
        if "activations" in res:
            acts.append(res.pop("activations"))
        bsz = len(idx)
        for k in ("psnr", "ssim", "lpips", "iou"):
            if k in res:
                sums[k] = sums.get(k, 0.0) + float(np.sum(res[k]))
        count += bsz
        if first_batch is None:
            first_batch = {
                k: res[k] for k in ("rgb", "depth", "mask") if k in res
            }

    out: Dict[str, object] = {f"{k}": v / max(count, 1)
                              for k, v in sums.items()}
    if acts and real_stats is not None:
        activations = jnp.asarray(np.concatenate(acts))
        mu, sigma = fid_mod.calculate_stats(activations)
        out["fid"] = float(
            fid_mod.frechet_distance(mu, sigma, real_stats[0], real_stats[1])
        )
    out["n_images"] = count
    out["first_batch"] = first_batch
    return out
