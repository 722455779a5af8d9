"""Ray/axis-aligned-bounding-box intersection for near/far plane computation.

TPU-native re-design of the reference slab test (reference:
lib/nerf_utils.py:227-275): fully vectorized, no boolean fancy-indexing —
miss rays are filled with masked min/max reductions so the whole computation
is one fused XLA program with static shapes. Gradients are stopped (the
reference runs this under no_grad).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_near_far_planes(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    scene_range: float,
    min_plane: float = 0.1,
    eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intersects rays with the cube [-scene_range, scene_range]^3.

    Args:
      ray_origins: [..., 3]
      ray_directions: [..., 3]
      scene_range: half-extent of the axis-aligned scene cube.
      min_plane: clamp for near/far (avoids rays starting inside/behind).
      eps: minimum separation enforced between near and far.

    Returns:
      (near, far) with shape [...]. Rays that miss the box are assigned the
      min near / max far over the hitting rays (keeps the sample distribution
      dense where geometry lives, exactly like the reference semantics).
    """
    o = jax.lax.stop_gradient(ray_origins)
    d = jax.lax.stop_gradient(ray_directions)

    invdir = 1.0 / d
    # Per-axis slab entry/exit: sign-select the box face.
    lo = jnp.where(invdir < 0, scene_range, -scene_range)
    hi = jnp.where(invdir < 0, -scene_range, scene_range)
    tmin = (lo - o) * invdir  # [..., 3]
    tmax = (hi - o) * invdir
    # An origin exactly on a face with a perpendicular direction produces
    # 0 * inf = NaN; treat the grazing ray as inside that slab (NaN would
    # otherwise poison every miss ray through the global min/max fill).
    tmin = jnp.where(jnp.isnan(tmin), -jnp.inf, tmin)
    tmax = jnp.where(jnp.isnan(tmax), jnp.inf, tmax)

    xmin, ymin, zmin = tmin[..., 0], tmin[..., 1], tmin[..., 2]
    xmax, ymax, zmax = tmax[..., 0], tmax[..., 1], tmax[..., 2]

    hit = jnp.logical_not((xmin > ymax) | (ymin > xmax))
    near = jnp.maximum(xmin, ymin)
    far = jnp.minimum(xmax, ymax)
    hit = hit & jnp.logical_not((near > zmax) | (zmin > far))
    near = jnp.maximum(near, zmin)
    far = jnp.minimum(far, zmax)

    # Fill miss rays with the min/max over hit rays (masked global reduction).
    # If NO ray hits (degenerate camera, e.g. a PnP dummy pose pointing away
    # from the scene), fall back to a finite default range — the reference
    # crashes on an empty masked min here (lib/nerf_utils.py:260-261); a
    # finite empty render lets dummy-pose evaluations proceed.
    big = jnp.asarray(jnp.finfo(near.dtype).max, near.dtype)
    any_hit = jnp.any(hit)
    diag = 2.0 * 1.7320508 * scene_range
    near_hit_min = jnp.where(
        any_hit, jnp.min(jnp.where(hit, near, big)), min_plane
    )
    far_hit_max = jnp.where(
        any_hit, jnp.max(jnp.where(hit, far, -big)), min_plane + diag
    )
    near = jnp.where(hit, near, near_hit_min)
    far = jnp.where(hit, far, far_hit_max)

    near = jnp.maximum(near, min_plane)
    far = jnp.maximum(far, min_plane)
    far = jnp.where(far - near < eps, near + eps, far)
    return near, far
