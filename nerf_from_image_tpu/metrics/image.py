"""On-device image metrics: PSNR, SSIM, IoU.

JAX re-design of the reference metrics (reference: lib/metrics.py:30-103).
The reference computes SSIM on CPU through skimage (a host roundtrip per
batch, lib/metrics.py:57-85); here SSIM is expressed as valid-window
depthwise convolutions so the whole metric stays on device and matches
skimage.metrics.structural_similarity (uniform 7x7 window, K1=0.01, K2=0.03)
on the interior region — identical numerics, since skimage crops the
(win//2)-wide border where its reflect-padding would differ.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def psnr(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    reduction: str = "mean",
    mask: Optional[jnp.ndarray] = None,
    max_db: float = 60.0,
) -> jnp.ndarray:
    """PSNR over [0, 1] images [B, H, W, C], clamped at 60 dB per sample.

    With `mask` [B, H, W] the metric is computed over masked pixels only
    (single pooled value, matching the reference's masked variant).
    """
    pred = jnp.clip(pred, 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)
    se = jnp.square(pred - target)
    if mask is not None:
        m = (mask > 0).astype(pred.dtype)[..., None]
        mse = jnp.sum(se * m) / jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
        batch = -10.0 * jnp.log10(mse)
    else:
        batch = -10.0 * jnp.log10(jnp.mean(se, axis=(1, 2, 3)))
    batch = jnp.minimum(batch, max_db)
    return jnp.mean(batch) if reduction == "mean" else batch


def _valid_mean_filter(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """7x7 (win x win) mean filter, VALID padding, per channel. x: [B,H,W,C]."""
    C = x.shape[-1]
    kernel = jnp.full((win, win, 1, C), 1.0 / (win * win), x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    reduction: str = "mean",
    win_size: int = 7,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity on [B, H, W, C] images in [0, 1]."""
    pred = jnp.clip(pred, 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)

    n = win_size * win_size
    cov_norm = n / (n - 1.0)
    ux = _valid_mean_filter(pred, win_size)
    uy = _valid_mean_filter(target, win_size)
    uxx = _valid_mean_filter(pred * pred, win_size)
    uyy = _valid_mean_filter(target * target, win_size)
    uxy = _valid_mean_filter(pred * target, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    batch = jnp.mean(s, axis=(1, 2, 3))
    return jnp.mean(batch) if reduction == "mean" else batch


def iou(
    alpha_pred: jnp.ndarray,
    alpha_real: jnp.ndarray,
    reduction: str = "mean",
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Mask IoU on [B, H, W] (or [B, 1, H, W]) alphas in [0, 1]."""
    p = alpha_pred > threshold
    r = alpha_real > threshold
    inter = jnp.sum((p & r).astype(jnp.float32), axis=(-2, -1))
    union = jnp.sum((p | r).astype(jnp.float32), axis=(-2, -1))
    eps = 1e-6
    batch = (inter + eps) / (union + eps)
    return jnp.mean(batch) if reduction == "mean" else batch.reshape(-1)
