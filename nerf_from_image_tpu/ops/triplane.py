"""Fast triplane bilinear sampling via corner-packed gather rows.

TPU gather throughput is bound by gathered ROW COUNT, not bytes (measured
on v5e: ~300M rows/s whether rows are 128B or 512B). The naive bilinear
sampler issues 4 corner gathers per plane per point (12 per field query).
Here each plane is pre-packed once per render into a [H, W, 4C] table whose
row at (y, x) holds the 2x2 corner neighborhood [(y,x), (y,x+1), (y+1,x),
(y+1,x+1)] — one gather per plane per point (3 per query), a 4x reduction
in gather rows, then the bilinear weights reduce the 4 packed corners on
the VPU.

Border semantics match grid_sample(padding_mode='border',
align_corners=True): coordinates are clamped to [0, W-1] before flooring
and the base cell to W-2, which yields identical values everywhere and
identical gradients almost everywhere (the clamp's zero-gradient region
coincides with the reference's constant-value region).

Packing is differentiable (shift-concat; its VJP is shift-add), so plane
gradients flow through the packed table automatically.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_corners(plane: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H, W, 4C] corner-packed table (edge-clamped)."""
    right = jnp.concatenate((plane[..., :, 1:, :], plane[..., :, -1:, :]),
                            axis=-2)
    down = jnp.concatenate((plane[..., 1:, :, :], plane[..., -1:, :, :]),
                           axis=-3)
    down_right = jnp.concatenate((down[..., :, 1:, :], down[..., :, -1:, :]),
                                 axis=-2)
    return jnp.concatenate((plane, right, down, down_right), axis=-1)


def sample_packed_with_rows(
    packed: jnp.ndarray, coords: jnp.ndarray, per_batch_gather: bool = False
):
    """sample_packed, also returning the gathered corner rows.

    The rows ([B*N, 4C], table dtype) are the residuals the fused-splat
    backward needs to form coordinate gradients without re-gathering
    (ops/pallas/splat.triplane_sample_mean).

    per_batch_gather=True issues one gather per batch element instead of
    one gather over the batch-flattened table: the per-element table
    ([H*W, 4C] = 16.8 MB at 256^2/C32 in bf16) fits the VMEM prefetch
    budget of XLA's memory-space-assignment pass, which runs such
    gathers ~6x faster than HBM-resident-table gathers (measured on v5e:
    15.6 vs 89 ms for 4.2M rows; the batch-flattened 67 MB table is too
    big to pin). Used by the fused-splat path, where the gathers
    dominate the remaining step time.
    """
    return _sample_packed_impl(packed, coords, per_batch_gather)


def sample_packed(packed: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly samples a corner-packed table.

    TPU gathers move ~3x more rows/s for bf16 rows than f32 (measured on
    v5e: 258 vs 81 Mrows/s at [65536, 128]); callers opt in by passing a
    bf16 `packed` table (RenderConfig.plane_dtype). In that mode the
    corner FMA itself also runs in bf16 and only the [N, C] result is
    cast back to coords' dtype — materializing the f32 [N, 4C] convert
    of the gathered rows costs more than the whole reduction (measured
    +16% end-to-end fwd+bwd at bench shapes). The f32 table path is
    exact f32 throughout.

    Args:
      packed: [B, H, W, 4C] from pack_corners (f32 or bf16).
      coords: [B, N, 2] in [-1, 1]; coords[..., 0] indexes W (x).

    Returns:
      [B, N, C] in coords' dtype.
    """
    return _sample_packed_impl(packed, coords)[0]


def _sample_packed_impl(
    packed: jnp.ndarray, coords: jnp.ndarray, per_batch_gather: bool = False
):
    B, H, W, C4 = packed.shape
    C = C4 // 4
    ix = jnp.clip((coords[..., 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)
    iy = jnp.clip((coords[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)
    x0f = jnp.minimum(jnp.floor(ix), W - 2)
    y0f = jnp.minimum(jnp.floor(iy), H - 2)
    wx1 = ix - x0f
    wy1 = iy - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    # mode='clip': indices are in-bounds by construction; the default 'fill'
    # mode materializes a broadcast+select pass over the gathered rows.
    if per_batch_gather and B > 1:
        idx_local = y0 * W + x0  # [B, N]
        rows = jnp.concatenate(
            [
                jnp.take(
                    packed[b].reshape(H * W, C4),
                    idx_local[b],
                    axis=0,
                    mode="clip",
                )
                for b in range(B)
            ],
            axis=0,
        )
    else:
        flat = packed.reshape(B * H * W, C4)
        batch_offset = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
        idx = (y0 * W + x0 + batch_offset).reshape(-1)
        rows = jnp.take(flat, idx, axis=0, mode="clip")
    fma_dtype = rows.dtype if rows.dtype == jnp.bfloat16 else coords.dtype
    if rows.dtype != fma_dtype:
        rows = rows.astype(fma_dtype)

    # Corner reduction via static lane slices (the [BN, 4C] -> [B, N, 4, C]
    # reshape is a physical lane->sublane relayout that costs as much as the
    # gather itself; 32-aligned lane slices fuse into the FMA instead).
    w00 = (wy0 * wx0).reshape(-1, 1).astype(fma_dtype)
    w01 = (wy0 * wx1).reshape(-1, 1).astype(fma_dtype)
    w10 = (wy1 * wx0).reshape(-1, 1).astype(fma_dtype)
    w11 = (wy1 * wx1).reshape(-1, 1).astype(fma_dtype)
    out = (
        rows[:, :C] * w00
        + rows[:, C : 2 * C] * w01
        + rows[:, 2 * C : 3 * C] * w10
        + rows[:, 3 * C :] * w11
    )
    return out.astype(coords.dtype).reshape(B, -1, C), rows


def plane_coords(coords3: jnp.ndarray):
    """[..., 3] normalized points -> the three plane coordinate pairs
    (xy, xz, yz) without gather-producing fancy indexing."""
    x, y, z = coords3[..., 0], coords3[..., 1], coords3[..., 2]
    return (
        jnp.stack((x, y), axis=-1),
        jnp.stack((x, z), axis=-1),
        jnp.stack((y, z), axis=-1),
    )
