"""Alpha compositing (volume rendering quadrature) along the sample axis.

Functional JAX re-design of the reference compositor (reference:
lib/nerf_utils.py:20-25 exclusive cumprod, :125-163 render_volume_density,
:166-182 weights-only variant) plus the EG3D-style weight smoothing the engine
applies before importance sampling (reference: run.py:267-272).

The transmittance scan is an exclusive cumulative product over the S axis —
XLA lowers jnp.cumprod to a log-depth associative scan that stays entirely
in registers/VMEM for the S=64..128 sample counts used here; the surrounding
elementwise math fuses into it. The Pallas fused ray-march kernel
(ops/pallas/raymarch.py) subsumes this path on the hot loop; this module is
the correctness oracle and the double-backward-safe path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def cumprod_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along the last axis (TF-style)."""
    cp = jnp.cumprod(x[..., :-1], axis=-1)
    return jnp.concatenate((jnp.ones_like(cp[..., :1]), cp), axis=-1)


def _alpha_weights(
    sigma: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    dists = jnp.concatenate(
        (
            depth_values[..., 1:] - depth_values[..., :-1],
            jnp.zeros_like(depth_values[..., :1]),
        ),
        axis=-1,
    )
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    return alpha * cumprod_exclusive(1.0 - alpha + 1e-10)


class CompositeOutput(NamedTuple):
    rgb: jnp.ndarray  # [..., C]
    depth: jnp.ndarray  # [...]
    mask: jnp.ndarray  # [...]
    normals: Optional[jnp.ndarray]  # [..., 3] or None
    semantics: Optional[jnp.ndarray]  # [..., K] or None


def render_volume_density(
    sigma: jnp.ndarray,
    rgb: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth_values: jnp.ndarray,
    normals: Optional[jnp.ndarray] = None,
    semantics: Optional[jnp.ndarray] = None,
    white_background: bool = True,
) -> CompositeOutput:
    """Composites per-sample (sigma, rgb[, normals, semantics]) into maps.

    Args:
      sigma: [..., S] densities.
      rgb: [..., S, C] colors/features.
      ray_directions: [..., 3] (un-normalized allowed; norm scales dists).
      depth_values: [..., S].
      normals/semantics: optional [..., S, K] per-sample extras.
      white_background: composite onto white (rgb and normals).

    Gradient semantics match the reference exactly: the depth map and the
    normal-map weights are computed through stop_gradient.
    """
    weights = _alpha_weights(sigma, ray_directions, depth_values)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(
        jax.lax.stop_gradient(weights) * jax.lax.stop_gradient(depth_values),
        axis=-1,
    )
    normal_map = None
    if normals is not None:
        normal_map = jnp.sum(
            jax.lax.stop_gradient(weights)[..., None] * normals, axis=-2
        )
    semantic_map = None
    if semantics is not None:
        semantic_map = jnp.sum(weights[..., None] * semantics, axis=-2)
    mask = jnp.sum(weights, axis=-1)

    if white_background:
        rgb_map = rgb_map + (1.0 - mask[..., None])
        if normal_map is not None:
            normal_map = normal_map + (1.0 - mask[..., None])

    return CompositeOutput(rgb_map, depth_map, mask, normal_map, semantic_map)


def render_volume_density_weights_only(
    sigma: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """Compositing weights only (for importance sampling); gradients stopped."""
    return jax.lax.stop_gradient(
        _alpha_weights(sigma, ray_directions, depth_values)
    )


def smooth_weights(weights: jnp.ndarray, bias: float = 0.01) -> jnp.ndarray:
    """EG3D-style weight smoothing before inverse-CDF sampling.

    max-pool (k=2, s=1, pad=1) then avg-pool (k=2, s=1) over the sample axis,
    plus a small uniform bias (reference: run.py:267-272).

    Args:
      weights: [..., S]
    Returns:
      [..., S] smoothed weights.
    """
    neg_inf = jnp.asarray(-jnp.inf, weights.dtype)
    padded = jnp.concatenate(
        (
            jnp.full_like(weights[..., :1], neg_inf),
            weights,
            jnp.full_like(weights[..., :1], neg_inf),
        ),
        axis=-1,
    )  # [..., S+2]
    pooled = jnp.maximum(padded[..., :-1], padded[..., 1:])  # [..., S+1]
    smoothed = 0.5 * (pooled[..., :-1] + pooled[..., 1:])  # [..., S]
    return smoothed + bias
