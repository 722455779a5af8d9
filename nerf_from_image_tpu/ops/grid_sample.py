"""Differentiable bilinear 2D grid sampling (border padding, align_corners).

Equivalent semantics to the reference's double-backward-capable sampler
(reference: lib/ops.py:58-120) and torch.nn.functional.grid_sample(
mode='bilinear', padding_mode='border', align_corners=True). In JAX the op
is built from gathers + elementwise math, so arbitrary-order differentiation
(needed by the eikonal loss, reference models/generator.py:516-537) falls out
of autodiff for free — no custom autograd Function needed.

Layout note (TPU-first): features are channel-minor ([B, H, W, C] tables,
[B, N, C] outputs) so the 4 corner gathers are contiguous C-wide row reads
and the interpolation is a lane-parallel FMA. The reference's NCHW layout
would put the gather stride on the minor axis — hostile to both XLA gather
and the Pallas kernel that replaces this op on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(table: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly samples a feature table at continuous 2D locations.

    Args:
      table: [B, H, W, C] feature plane.
      coords: [B, N, 2] normalized sample locations in [-1, 1]; coords[..., 0]
        indexes W (x), coords[..., 1] indexes H (y). align_corners=True
        convention: -1 maps to pixel 0, +1 to pixel H-1/W-1. Out-of-range
        coordinates clamp to the border, but the interpolation weights are
        computed from the unclamped position (matching the reference, which
        keeps gradients alive at the border).

    Returns:
      [B, N, C] sampled features.
    """
    B, H, W, C = table.shape
    ix = (coords[..., 0] + 1.0) * 0.5 * (W - 1)  # [B, N]
    iy = (coords[..., 1] + 1.0) * 0.5 * (H - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)

    # Corner weights from the *unclamped* continuous position.
    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = jnp.clip(ix0.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(ix0.astype(jnp.int32) + 1, 0, W - 1)
    y0 = jnp.clip(iy0.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(iy0.astype(jnp.int32) + 1, 0, H - 1)

    # Flat global-index gather: one [B*N] row gather from a [B*H*W, C]
    # table hits XLA's fast TPU gather path (take_along_axis over a batched
    # 3D operand is orders of magnitude slower).
    flat = table.reshape(B * H * W, C)
    batch_offset = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def gather(yi, xi):
        idx = (yi * W + xi + batch_offset).reshape(-1)  # [B*N]
        return jnp.take(flat, idx, axis=0, mode="clip").reshape(B, -1, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    w00 = (wy0 * wx0)[..., None]
    w01 = (wy0 * wx1)[..., None]
    w10 = (wy1 * wx0)[..., None]
    w11 = (wy1 * wx1)[..., None]

    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def grid_sample_2d_zeros(table: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zeros padding and align_corners=False.

    torch.nn.functional.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False) semantics — used by the ADA augmentation pipeline
    (reference: run.py:798-806).

    Args:
      table: [B, H, W, C]; coords: [B, N, 2] in [-1, 1] (x indexes W).
    Returns:
      [B, N, C].
    """
    B, H, W, C = table.shape
    ix = ((coords[..., 0] + 1.0) * W - 1.0) * 0.5
    iy = ((coords[..., 1] + 1.0) * H - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = ix0.astype(jnp.int32)
    y0i = iy0.astype(jnp.int32)

    flat = table.reshape(B * H * W, C)
    batch_offset = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def corner(yi, xi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        idx = (idx + batch_offset).reshape(-1)
        v = jnp.take(flat, idx, axis=0, mode="clip").reshape(B, -1, C)
        return v * (w * valid.astype(table.dtype))[..., None]

    return (
        corner(y0i, x0i, wy0 * wx0)
        + corner(y0i, x0i + 1, wy0 * wx1)
        + corner(y0i + 1, x0i, wy1 * wx0)
        + corner(y0i + 1, x0i + 1, wy1 * wx1)
    )


def grid_sample_2d_zeros_packed(
    table: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """`grid_sample_2d_zeros` via one corner-packed gather per point.

    Identical arithmetic (same four corner values, same FMA order, so
    golden-exact vs the 4-gather path) at 1/4 the gather rows and 1/4 the
    backward scatter rows — TPU gathers/scatters are row-rate bound (see
    ops/triplane.py). The table is zero-padded by one pixel so the packed
    row at the clamped base cell always holds the correct 2x2 neighborhood;
    fully out-of-range corners are zeroed by the validity weights exactly
    like the unpacked path.

    Args:
      table: [B, H, W, C]; coords: [B, N, 2] in [-1, 1] (x indexes W).
    Returns:
      [B, N, C].
    """
    from nerf_from_image_tpu.ops.triplane import pack_corners

    B, H, W, C = table.shape
    padded = jnp.pad(table, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = pack_corners(padded)  # [B, H+2, W+2, 4C]
    Hp, Wp = H + 2, W + 2

    ix = ((coords[..., 0] + 1.0) * W - 1.0) * 0.5
    iy = ((coords[..., 1] + 1.0) * H - 1.0) * 0.5
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = ix0.astype(jnp.int32)
    y0i = iy0.astype(jnp.int32)
    # Base cell in padded coordinates; the clip only engages when the whole
    # 2x2 neighborhood is out of range, where validity zeroes every corner.
    xb = jnp.clip(x0i + 1, 0, Wp - 2)
    yb = jnp.clip(y0i + 1, 0, Hp - 2)

    flat = packed.reshape(B * Hp * Wp, 4 * C)
    batch_offset = (jnp.arange(B, dtype=jnp.int32) * (Hp * Wp))[:, None]
    idx = (yb * Wp + xb + batch_offset).reshape(-1)
    rows = jnp.take(flat, idx, axis=0, mode="clip").reshape(B, -1, 4 * C)

    def vw(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        return (w * valid.astype(table.dtype))[..., None]

    return (
        rows[..., :C] * vw(x0i, y0i, wy0 * wx0)
        + rows[..., C : 2 * C] * vw(x0i + 1, y0i, wy0 * wx1)
        + rows[..., 2 * C : 3 * C] * vw(x0i, y0i + 1, wy1 * wx0)
        + rows[..., 3 * C :] * vw(x0i + 1, y0i + 1, wy1 * wx1)
    )
