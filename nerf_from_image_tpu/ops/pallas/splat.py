"""Ray-coherent bilinear splat: the backward of triplane sampling as a
windowed-matmul Pallas kernel instead of an XLA scatter-add.

Why. The render step's backward is dominated by six scatter-adds (3 planes
x coarse+fine passes) of ~4.2M update rows each into the corner-packed
plane tables; XLA's scatter is row-descriptor bound at a flat ~57-68
Mrows/s no matter the index order, dtype, or destination (measured — see
ops/pallas/__init__.py), ~368 ms of a 727 ms bench step. The only lever is
issuing FEWER dynamically-addressed rows.

How. Points are processed in ray-coherent blocks (an image tile x a slab of
consecutive depth samples). A block's bilinear footprint on a plane is a
small contiguous box, so its whole contribution is formed as ONE dense
window tile and accumulated with ONE dynamic-offset vector store:

    dPlane[y, x, c] += sum_n  ty[n, y] * tx[n, x] * g[n, c]

where ty/tx are the bilinearly-weighted two-hot row/column selectors —
tent functions max(0, 1 - |i - coord|), which put (1-frac, frac) on
(floor, floor+1) and 0 elsewhere, matching sample_packed's corner weights
exactly (including the floor-to-(H-2) boundary clamp). Separability of the
bilinear kernel collapses the 4 corners into this rank-1 structure,
evaluated per block as one MXU contraction:

    Z[n, lx*C + c] = tx[n, lx] * g[n, c]           (VPU, [P, WX*C])
    T[ly, lx*C + c] = sum_n ty[n, ly] * Z[n, ...]  (MXU, [WY, WX*C])
    acc_p[oy0 + ly, (ox0 + lx)*C + c] += T         (one dynamic store)

All THREE planes are fused into one kernel call: the three f32 accumulators
are the full unpacked plane gradients [H, W*C] (3 x 8.4 MB — v5e VMEM
takes it with vmem_limit_bytes raised; the 16 MB "limit" round 2 measured
is only the compiler's default scoped cap), kept resident in the output
blocks across a batch element's sequential grid steps, and the per-point
gradient g streams from HBM once instead of three times. Per-pass
dynamically-addressed "rows" drop from 3 x 4.2M to 3 x (#blocks) window
stores — an algorithmic row reduction of x P.

Per-block footprints that overflow the [WY, WX] window (grazing rays,
~1-3% of blocks at bench geometry — scripts/bench_splat.py) are skipped by
the kernel and exactly splatted by a small fixed-budget scatter
(residual_scatter_splat). Only if misfits exceed the budget does `lax.cond`
route the whole call to the full scatter fallback (pathological close-up
cameras), so the op is exact for ANY geometry.

Window alignment: oy0 is 8-aligned (f32 sublane tile), ox0 is 4-aligned so
the lane offset ox0*C is a multiple of 128. Both are clamped to keep the
window inside the plane, so edge blocks stay exact.

Numerics: with compute_dtype=bfloat16 the tent weights and update rows are
bf16 but accumulation is f32 (MXU accumulate + f32 accumulator) — strictly
better conditioned than the XLA path it replaces, whose bf16 plane tables
make scatter accumulate in bf16. Fractions are extracted in f32 BEFORE the
bf16 cast (casting a 200.7 pixel coordinate to bf16 directly would round
the fraction away). compute_dtype=float32 uses HIGHEST-precision matmuls
(~1e-6 rel err vs the scatter reference).

Reference hot path being replaced: models/generator.py:587-684 +
lib/ops.py:58-120 (grid_sample2d backward).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _tent(lanes_i32, l0, frac, width, cd):
    """Weighted two-hot selector: (1-frac, frac) at (l0, l0+1), else 0.

    l0 is a small integer (exact in bf16); frac in [0, 1] carries the
    bilinear weight. lanes/l0/frac enter in f32, the wide arithmetic runs
    in compute dtype `cd`.
    """
    lanes = lanes_i32.astype(cd)
    d = lanes - l0.astype(cd) - frac.astype(cd)
    one = jnp.ones((), cd)
    zero = jnp.zeros((), cd)
    return jnp.maximum(zero, one - jnp.abs(d))


def _splat3_kernel(
    oy0_ref,  # [3*NB] i32 per-plane window row origins
    ox0_ref,  # [3*NB] i32 per-plane window col origins
    ok_ref,  # [3*NB] i32 per-plane fit flags
    xyz_ref,  # [1, 3, P] f32 rows: normalized (x, y, z) in [-1, 1]
    g_ref,  # [1, P//4, 4C] quad-packed per-point gradient
    o1_ref,  # HBM [B, H, W*C] f32 (memory_space=ANY; written by DMA)
    o2_ref,
    o3_ref,
    acc_ref,  # VMEM scratch [3, H, W*C] f32: the resident accumulators
    sem_ref,  # DMA semaphores (3,)
    *,
    H: int,
    W: int,
    C: int,
    WY: int,
    WX: int,
    P: int,
    nblocks: int,
    compute_dtype,
):
    b = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    blk = b * nblocks + k
    NBtot = jnp.int32(nblocks) * pl.num_programs(0)

    cd = compute_dtype
    f32 = jnp.float32
    precision = (
        jax.lax.Precision.HIGHEST if cd == f32 else jax.lax.Precision.DEFAULT
    )

    # [3, P] -> per-point sublane layout [P, 3] (single small relayout).
    # The [-1,1] -> pixel transform runs in-kernel: passing raw (x, y, z)
    # instead of six per-plane pixel arrays halves the host-side blocked
    # transposes (each one materializes a padded 7D temp). Any float
    # divergence vs the host-computed windows is covered by the 1px slack
    # in block_offsets_and_fits.
    coords = xyz_ref[0].T  # [P, 3] f32

    # Quad-packed g -> [P, C] in the kernel's point order n' = q*(P//4)+m
    # (the host permutes coords identically): 4 static lane slices + a
    # sublane concat — no lane->sublane relayout, dense 128-lane DMA.
    g4 = g_ref[0]  # [P//4, 4C]
    gt_parts = []
    for q in range(4):
        gq = g4[:, q * C : (q + 1) * C].astype(cd)  # [P//4, C]
        gt_parts.append(jnp.tile(gq, (1, WX)))  # [P//4, WX*C]
    GT = jnp.concatenate(gt_parts, axis=0)  # [P, WX*C]

    ylanes = jax.lax.broadcasted_iota(jnp.int32, (P, WY), 1)
    xlanes = jax.lax.broadcasted_iota(jnp.int32, (P, WX), 1)

    for p in range(3):
        oy0 = oy0_ref[p * NBtot + blk]
        ox0 = ox0_ref[p * NBtot + blk]
        ok = ok_ref[p * NBtot + blk]

        ax, ay = ((0, 1), (0, 2), (1, 2))[p]

        def _splat(oy0=oy0, ox0=ox0, ok=ok, p=p, ax=ax, ay=ay):
            cx = coords[:, ax : ax + 1]  # [P, 1] f32 normalized
            cy = coords[:, ay : ay + 1]
            ix = jnp.clip((cx + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)
            iy = jnp.clip((cy + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)
            # Fractions in f32 (bf16 cannot represent a 200.7 pixel coord).
            x0f = jnp.minimum(jnp.floor(ix), W - 2.0)
            y0f = jnp.minimum(jnp.floor(iy), H - 2.0)
            wy1 = iy - y0f
            wx1 = ix - x0f
            yl0 = y0f - oy0.astype(f32)  # small ints: exact in bf16
            xl0 = x0f - ox0.astype(f32)

            ty = _tent(ylanes, yl0, wy1, WY, cd)  # [P, WY]
            tx = _tent(xlanes, xl0, wx1, WX, cd)  # [P, WX]
            zx = pltpu.repeat(tx, C, axis=1)  # [P, WX*C], lx-major c-minor
            Z = zx * GT

            T = jax.lax.dot_general(
                ty,
                Z,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )

            # Belt-and-braces: never let a bad offset escape VMEM bounds
            # (a wild dynamic store crashes the TPU worker).
            row0 = pl.multiple_of(
                jnp.clip(oy0, 0, H - WY) & ~jnp.int32(7), 8
            )
            lane0 = pl.multiple_of(
                (jnp.clip(ox0, 0, W - WX) & ~jnp.int32(3)) * C, 128
            )
            acc_ref[p, pl.ds(row0, WY), pl.ds(lane0, WX * C)] += T

        pl.when(ok != 0)(_splat)

    # Flush the accumulators to HBM once per batch element via explicit
    # DMA. The outputs deliberately bypass the VMEM output-block pipeline:
    # on this TPU platform a pallas VMEM-block output >= ~1MB inside a
    # large XLA program crashes the worker (measured by bisection —
    # HBM-space outputs written with make_async_copy are solid).
    @pl.when(k == nblocks - 1)
    def _flush():
        outs = (o1_ref, o2_ref, o3_ref)
        for p in range(3):
            d = pltpu.make_async_copy(
                acc_ref.at[p], outs[p].at[b], sem_ref.at[p]
            )
            d.start()
        for p in range(3):
            pltpu.make_async_copy(
                acc_ref.at[p], outs[p].at[b], sem_ref.at[p]
            ).wait()


def splat3_blocks(
    xyz: jnp.ndarray,
    g4: jnp.ndarray,
    oy0: jnp.ndarray,
    ox0: jnp.ndarray,
    ok: jnp.ndarray,
    *,
    B: int,
    H: int,
    W: int,
    C: int,
    WY: int,
    WX: int,
    compute_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused 3-plane Pallas windowed splat of pre-blocked points.

    Args:
      xyz: [B*NB, 3, P] f32 — normalized (x, y, z) rows in the kernel's
        q-major in-block point order (see triplane_splat_grads.blocks_q).
      g4: [B*NB, P//4, 4C] — quad-packed upstream gradient.
      oy0, ox0, ok: [3, B*NB] i32 per-plane window origins / fit flags.

    Returns: three [B, H, W, C] f32 plane gradients.
    """
    NBtot, three, P = xyz.shape
    assert three == 3 and NBtot % B == 0
    nblocks = NBtot // B
    assert g4.shape == (NBtot, P // 4, 4 * C)
    assert H >= WY and W >= WX
    if interpret is None:
        import os

        interpret = (
            jax.default_backend() != "tpu"
            or bool(os.environ.get("NFI_SPLAT_INTERPRET"))
        )

    kernel = functools.partial(
        _splat3_kernel,
        H=H,
        W=W,
        C=C,
        WY=WY,
        WX=WX,
        P=P,
        nblocks=nblocks,
        compute_dtype=compute_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, 3, P),
                lambda b, k, *_: (b * nblocks + k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, P // 4, 4 * C),
                lambda b, k, *_: (b * nblocks + k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((3, H, W * C), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, H, W * C), jnp.float32) for _ in range(3)
    )
    o1, o2, o3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_LIMIT,
    )(
        oy0.reshape(-1),
        ox0.reshape(-1),
        ok.astype(jnp.int32).reshape(-1),
        xyz,
        g4,
    )
    return tuple(o.reshape(B, H, W, C) for o in (o1, o2, o3))


# ---------------------------------------------------------------------------
# XLA-side helpers: pixel coords, blocking, window origins, fallback scatter.
# ---------------------------------------------------------------------------


def pixel_coords(coords2: jnp.ndarray, H: int, W: int):
    """[-1, 1] normalized plane coords -> clipped pixel (ix, iy) f32.

    Must match ops/triplane.sample_packed bit-for-bit (same ops, same
    order) so the kernel's in-block corner indices agree with the forward.
    """
    ix = jnp.clip((coords2[..., 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)
    iy = jnp.clip((coords2[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)
    return ix, iy


def to_blocks(x: jnp.ndarray, block_shape: Tuple[int, int, int]):
    """[B, Himg, Wimg, S, ...] -> [B*NB, P, ...] ray-coherent blocks.

    block_shape = (th, tw, ts): an image tile of th x tw rays by ts
    consecutive depth samples per block; P = th*tw*ts.
    """
    th, tw, ts = block_shape
    B, Hi, Wi, S = x.shape[:4]
    rest = x.shape[4:]
    assert Hi % th == 0 and Wi % tw == 0 and S % ts == 0, (
        (Hi, Wi, S), block_shape
    )
    nh, nw, ns = Hi // th, Wi // tw, S // ts
    x = x.reshape((B, nh, th, nw, tw, ns, ts) + rest)
    x = jnp.moveaxis(x, (2, 4), (4, 5))  # [B, nh, nw, ns, th, tw, ts, ...]
    return x.reshape((B * nh * nw * ns, th * tw * ts) + rest)


def quad_permute(x: jnp.ndarray):
    """[NB, P, ...] -> same, point order n' = q*(P//4) + m for n = 4m+q.

    Matches the kernel's quad-packed g layout: g4 row m holds points
    4m..4m+3, and the in-kernel sublane concat lays them out q-major.
    """
    NB, P = x.shape[:2]
    rest = x.shape[2:]
    x = x.reshape((NB, P // 4, 4) + rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((NB, P) + rest)


def block_offsets_and_fits(
    ix_blocks: jnp.ndarray,
    iy_blocks: jnp.ndarray,
    *,
    H: int,
    W: int,
    WY: int,
    WX: int,
):
    """Aligned window origins + per-block footprint-fits flags.

    ix_blocks/iy_blocks: [NB, P] clipped pixel coords.
    Returns (oy0 [NB], ox0 [NB], fits [NB] bool).
    """
    x0 = jnp.minimum(jnp.floor(ix_blocks), W - 2.0).astype(jnp.int32)
    y0 = jnp.minimum(jnp.floor(iy_blocks), H - 2.0).astype(jnp.int32)
    xmin = jnp.min(x0, axis=1)
    xmax = jnp.max(x0, axis=1)  # corner x0+1 also touched
    ymin = jnp.min(y0, axis=1)
    ymax = jnp.max(y0, axis=1)
    ox0 = jnp.clip(xmin - (xmin % 4), 0, W - WX)
    oy0 = jnp.clip(ymin - (ymin % 8), 0, H - WY)
    # 1px slack beyond the exact bound: the kernel recomputes pixel
    # coords from raw (x, y, z) and excess-precision FMA contraction may
    # flip a floor by one at exact-integer coordinates. The explicit
    # range checks guard against garbage int stats (a NaN coordinate
    # converts to an arbitrary int32; equal garbage mins/maxes would
    # otherwise pass the span test and aim the kernel's dynamic store
    # outside the accumulator — a TPU fault).
    fits = (
        (xmax + 2 - ox0 <= WX - 1)
        & (ymax + 2 - oy0 <= WY - 1)
        & (xmin >= 0)
        & (ymin >= 0)
        & (xmax <= W - 2)
        & (ymax <= H - 2)
    )
    return oy0, ox0, fits


def _packed_corner_scatter(
    iy: jnp.ndarray,
    ix: jnp.ndarray,
    g: jnp.ndarray,
    bidx: jnp.ndarray,
    *,
    B: int,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Scatter bilinear corner updates as 4C-wide packed rows, then unpack.

    iy/ix: [R, P] pixel coords; g: [R, P, C] update values (its dtype is
    the scatter-accumulate dtype); bidx: [R] batch index per row-group.
    One scatter row per point (full 128-lane rows — no tile padding), into
    a [B*H*W, 4C] table whose row (y0, x0) holds the 4 corners; the
    zero-pad shift unpack is exact because x0 <= W-2 and y0 <= H-2.
    Returns [B, H, W, C] f32.
    """
    R, P, C = g.shape
    x0f = jnp.minimum(jnp.floor(ix), W - 2.0)
    y0f = jnp.minimum(jnp.floor(iy), H - 2.0)
    wx1 = (ix - x0f).astype(g.dtype)
    wy1 = (iy - y0f).astype(g.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    rows = (
        bidx[:, None] * (H * W)
        + y0f.astype(jnp.int32) * W
        + x0f.astype(jnp.int32)
    ).reshape(-1)
    upd = jnp.concatenate(
        [
            g * (wy0 * wx0)[..., None],
            g * (wy0 * wx1)[..., None],
            g * (wy1 * wx0)[..., None],
            g * (wy1 * wx1)[..., None],
        ],
        axis=-1,
    ).reshape(-1, 4 * C)
    packed = (
        jnp.zeros((B * H * W, 4 * C), g.dtype).at[rows].add(upd)
    ).astype(jnp.float32)
    p = packed.reshape(B, H, W, 4 * C)
    out = p[..., :C]
    out = out + jnp.pad(
        p[:, :, :-1, C : 2 * C], ((0, 0), (0, 0), (1, 0), (0, 0))
    )
    out = out + jnp.pad(
        p[:, :-1, :, 2 * C : 3 * C], ((0, 0), (1, 0), (0, 0), (0, 0))
    )
    out = out + jnp.pad(
        p[:, :-1, :-1, 3 * C :], ((0, 0), (1, 0), (1, 0), (0, 0))
    )
    return out


def residual_scatter_splat(
    iyb: jnp.ndarray,
    ixb: jnp.ndarray,
    gflat: jnp.ndarray,
    fits: jnp.ndarray,
    *,
    B: int,
    H: int,
    W: int,
    C: int,
    budget: int,
) -> jnp.ndarray:
    """Exact splat of up to `budget` window-overflowing blocks.

    Compacts the misfit blocks (static-size nonzero), builds corner-packed
    update rows for their points, and scatter-adds budget*P rows — a tiny
    scatter compared to the all-points one. Correct only when the number of
    misfit blocks is <= budget (the caller cond's on that).

    iyb/ixb: [B*NB, P]; gflat: [B*NB, P*C] channel-merged updates;
    fits: [B*NB] bool. Returns [B, H, W, C] f32.
    """
    NBtot, P = iyb.shape
    nblocks = NBtot // B
    (bad,) = jnp.nonzero(~fits, size=budget, fill_value=NBtot)
    valid = bad < NBtot  # [budget]
    safe = jnp.minimum(bad, NBtot - 1)
    ix = ixb[safe]  # [budget, P] (q-major order)
    iy = iyb[safe]
    # gflat rows are natural-order; the coords are q-major — reorder the
    # few gathered blocks (cheap at budget size) so the triples align.
    g = gflat[safe].reshape(budget, P // 4, 4, C)
    g = jnp.swapaxes(g, 1, 2).reshape(budget, P, C)
    g = g * valid[:, None, None].astype(gflat.dtype)
    bblk = (safe // nblocks).astype(jnp.int32)  # [budget]
    return _packed_corner_scatter(iy, ix, g, bblk, B=B, H=H, W=W)


def xla_scatter_splat(
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    g: jnp.ndarray,
    *,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Exact full fallback for any geometry (one packed-corner scatter).

    ix, iy: [B, N] clipped pixel coords; g: [B, N, C] (dtype = accumulate
    dtype). Returns [B, H, W, C] f32.
    """
    B = g.shape[0]
    bidx = jnp.arange(B, dtype=jnp.int32)
    return _packed_corner_scatter(iy, ix, g, bidx, B=B, H=H, W=W)


def triplane_splat_grads(
    coords3: jnp.ndarray,
    g: jnp.ndarray,
    *,
    H: int,
    W: int,
    block_shape: Tuple[int, int, int],
    img_shape: Tuple[int, int, int],
    WY: int = 64,
    WX: int = 64,
    misfit_budget: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gradients of all three triplanes for a shared per-point gradient.

    The mean-of-planes decode gives every plane the SAME upstream per-point
    gradient g (already divided by 3 by the caller); the planes differ only
    in their 2D projections (xy, xz, yz — ops/triplane.plane_coords).

    coords3: [B, N, 3] normalized query points; g: [B, N, C];
    img_shape: (Himg, Wimg, S) ray-grid structure, N = Himg*Wimg*S.
    Returns three [B, H, W, C] f32 plane gradients (xy, xz, yz).
    """
    from nerf_from_image_tpu.ops.triplane import plane_coords

    B, N, C = g.shape
    Hi, Wi, S = img_shape
    assert N == Hi * Wi * S, (N, img_shape)

    th, tw, ts = block_shape
    assert ts == 4, (
        "splat blocks use a 4-sample depth slab: the kernel's quad-packed "
        "g rows make the in-block point permutation free only when ts=4"
    )
    nh, nw, ns = Hi // th, Wi // tw, S // ts
    NBtot = B * nh * nw * ns
    P = th * tw * ts

    def blocks_q(x):
        """[B, Hi, Wi, S] -> [NBtot, P] in the kernel's q-major point
        order n' = its*(th*tw) + (ith*tw + itw). One 7D transpose whose
        minor dim is tw (not ts) — a ts-minor layout would tile-pad 32x
        and alone OOM the chip (measured)."""
        x = x.reshape(B, nh, th, nw, tw, ns, ts)
        x = jnp.transpose(x, (0, 1, 3, 5, 6, 2, 4))
        return x.reshape(NBtot, P)

    # Block the three RAW coordinate channels once (3 transposes — the
    # per-plane pixel arrays are cheap elementwise functions of these, so
    # blocking pixels directly would double the transpose count).
    xb = blocks_q(coords3[..., 0].reshape(B, Hi, Wi, S))
    yb = blocks_q(coords3[..., 1].reshape(B, Hi, Wi, S))
    zb = blocks_q(coords3[..., 2].reshape(B, Hi, Wi, S))
    axes = ((xb, yb), (xb, zb), (yb, zb))  # (ix-source, iy-source)

    def pix(c, n):
        return jnp.clip((c + 1.0) * 0.5 * (n - 1), 0.0, n - 1.0)

    ixbs, iybs = [], []
    oy0s, ox0s, fitss = [], [], []
    for cxb, cyb in axes:
        ixb = pix(cxb, W)
        iyb = pix(cyb, H)
        oy0, ox0, fits = block_offsets_and_fits(
            ixb, iyb, H=H, W=W, WY=WY, WX=WX
        )
        ixbs.append(ixb)
        iybs.append(iyb)
        oy0s.append(oy0)
        ox0s.append(ox0)
        fitss.append(fits)

    if misfit_budget is None:
        misfit_budget = max(16, NBtot // 16)
    misfit_budget = min(misfit_budget, NBtot)

    # Block g with channels MERGED into the minor dim throughout: any
    # [..., C=32]-minor temp carries a 4x lane-padding tax in HBM
    # (T(8,128) tiles) — at bench shapes that alone OOMs the chip. The
    # (ts*C)-merged minor dim is exactly 128 lanes: no padding anywhere,
    # and the resulting rows ARE the kernel's quad-packed g4 (row m =
    # one ray-slab, lanes (s-in-slab, c)).
    gc = g.astype(compute_dtype).reshape(B, Hi, Wi, S * C)
    gc = gc.reshape(B, nh, th, nw, tw, ns, ts * C)
    gc = jnp.moveaxis(gc, (2, 4), (4, 5))
    gflat = gc.reshape(NBtot, P * C)  # natural point-major, c-minor
    g4 = gflat.reshape(NBtot, P // 4, 4 * C)

    xyz = jnp.stack((xb, yb, zb), axis=1)  # [NBtot, 3, P], q-major
    oy0 = jnp.stack(oy0s)
    ox0 = jnp.stack(ox0s)
    fits = jnp.stack(fitss)  # [3, NBtot]
    n_misfit = jnp.max(jnp.sum((~fits).astype(jnp.int32), axis=1))

    def fast(_):
        mains = splat3_blocks(
            xyz,
            g4,
            oy0,
            ox0,
            fits,
            B=B,
            H=H,
            W=W,
            C=C,
            WY=WY,
            WX=WX,
            compute_dtype=compute_dtype,
            interpret=interpret,
        )
        outs = []
        for p in range(3):
            resid = residual_scatter_splat(
                iybs[p],
                ixbs[p],
                gflat,
                fits[p],
                B=B,
                H=H,
                W=W,
                C=C,
                budget=misfit_budget,
            )
            outs.append(mains[p] + resid)
        return tuple(outs)

    def slow(_):
        # Full fallback, memory-lean: scan over block groups so the
        # [group, P, 4C] corner-update temps stay ~100 MB instead of the
        # >1 GB an all-blocks materialization costs (the cond allocates
        # the union of both branches — an all-at-once fallback pushed the
        # whole bench step past HBM).
        nblocks = NBtot // B
        bidx = jnp.arange(NBtot, dtype=jnp.int32) // nblocks
        n_groups = 8
        while NBtot % n_groups:
            n_groups //= 2
        gsz = NBtot // n_groups

        def splat_one(p):
            def body(table, idx):
                iy = jax.lax.dynamic_slice_in_dim(iybs[p], idx * gsz, gsz)
                ix = jax.lax.dynamic_slice_in_dim(ixbs[p], idx * gsz, gsz)
                gq = jax.lax.dynamic_slice_in_dim(gflat, idx * gsz, gsz)
                g = jnp.swapaxes(
                    gq.reshape(gsz, P // 4, 4, C), 1, 2
                ).reshape(gsz, P, C)
                bi = jax.lax.dynamic_slice_in_dim(bidx, idx * gsz, gsz)
                x0f = jnp.minimum(jnp.floor(ix), W - 2.0)
                y0f = jnp.minimum(jnp.floor(iy), H - 2.0)
                wx1 = (ix - x0f).astype(g.dtype)
                wy1 = (iy - y0f).astype(g.dtype)
                wx0 = 1.0 - wx1
                wy0 = 1.0 - wy1
                rows = (
                    bi[:, None] * (H * W)
                    + y0f.astype(jnp.int32) * W
                    + x0f.astype(jnp.int32)
                ).reshape(-1)
                upd = jnp.concatenate(
                    [
                        g * (wy0 * wx0)[..., None],
                        g * (wy0 * wx1)[..., None],
                        g * (wy1 * wx0)[..., None],
                        g * (wy1 * wx1)[..., None],
                    ],
                    axis=-1,
                ).reshape(-1, 4 * C)
                return table.at[rows].add(upd), None

            table = jnp.zeros((B * H * W, 4 * C), gflat.dtype)
            table, _ = jax.lax.scan(
                body, table, jnp.arange(n_groups, dtype=jnp.int32)
            )
            pk = table.astype(jnp.float32).reshape(B, H, W, 4 * C)
            out = pk[..., :C]
            out = out + jnp.pad(
                pk[:, :, :-1, C : 2 * C],
                ((0, 0), (0, 0), (1, 0), (0, 0)),
            )
            out = out + jnp.pad(
                pk[:, :-1, :, 2 * C : 3 * C],
                ((0, 0), (1, 0), (0, 0), (0, 0)),
            )
            out = out + jnp.pad(
                pk[:, :-1, :-1, 3 * C :],
                ((0, 0), (1, 0), (1, 0), (0, 0)),
            )
            return out

        return tuple(splat_one(p) for p in range(3))

    return jax.lax.cond(n_misfit <= misfit_budget, fast, slow, operand=None)


# ---------------------------------------------------------------------------
# The differentiable op: packed-gather forward, fused-splat backward.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def triplane_sample_mean(
    planes: jnp.ndarray,
    coords3: jnp.ndarray,
    img_shape: Tuple[int, int, int],
    table_dtype: Optional[str],
    block_shape: Tuple[int, int, int] = (16, 16, 4),
    WY: int = 128,
    WX: int = 64,
    save_rows: bool = True,
) -> jnp.ndarray:
    """Mean of the three bilinearly-sampled triplane features.

    Forward: identical computation (op for op) to the production path —
    cast planes to `table_dtype`, corner-pack (ops/triplane.pack_corners),
    one gather per plane per point, bf16 corner FMA, f32 mean.

    Backward: plane gradients via the ray-coherent Pallas windowed splat
    (triplane_splat_grads) instead of XLA's row-rate-bound scatter-add;
    coordinate gradients analytically from the gathered corner rows.

    First-order only: the bwd is not differentiable — double-backward
    paths (eikonal and other regularizers) use the grid_sample route,
    mirroring the reference's requires_double_backward split
    (models/generator.py:306-311).

    Args:
      planes: [B, 3, H, W, C] raw (unpacked) triplanes.
      coords3: [B, N, 3] normalized query points, N = prod(img_shape).
      img_shape: (Himg, Wimg, S) ray-grid structure of the points.
      table_dtype: 'bfloat16' for the production gather tables, None for
        strict f32.
      save_rows: True stores the pre-contracted dcoord residuals
        ([B*N, 2C] per plane — the fastest backward, +1.6 GB/pass of HBM
        at bench shapes); False stores only the corner-packed table
        (~33 MB) and RE-GATHERS the rows in the backward — this is what
        lets the full-gradient unchunked splat step fit v5e HBM at B=4
        (10.55 -> ~7.4 GB temps; see ops/pallas/__init__.py).
    """
    out, _ = _tsm_fwd(
        planes, coords3, img_shape, table_dtype, block_shape, WY, WX,
        save_rows,
    )
    return out


def _tsm_fwd(
    planes, coords3, img_shape, table_dtype, block_shape, WY, WX, save_rows
):
    from nerf_from_image_tpu.ops.triplane import (
        pack_corners,
        plane_coords,
        sample_packed_with_rows,
    )

    tp = planes.astype(table_dtype) if table_dtype is not None else planes
    packed = pack_corners(tp)
    c_xy, c_xz, c_yz = plane_coords(coords3)
    H, W = planes.shape[-3], planes.shape[-2]
    us = []
    es = []
    for k, c2 in enumerate((c_xy, c_xz, c_yz)):
        e, rows = sample_packed_with_rows(
            packed[:, k], c2, per_batch_gather=True
        )
        es.append(e)
        if save_rows:
            us.append(_make_dcoord_residual(rows, c2, H, W))
    out = (es[0] + es[1] + es[2]) / 3.0
    # Zero-size token carrying the plane shape/dtype into the bwd.
    shape_token = jnp.zeros(planes.shape[:-1] + (0,), planes.dtype)
    if save_rows:
        return out, (coords3, tuple(us), shape_token, None)
    return out, (coords3, None, shape_token, packed)


def _make_dcoord_residual(rows, coords2, H, W):
    """Pre-contract gathered corner rows into the two C-vectors the
    coordinate gradient needs:

        u_x = wy0*(r01-r00) + wy1*(r11-r10)   (-> d out / d ix)
        u_y = wx0*(r10-r00) + wx1*(r11-r01)   (-> d out / d iy)

    Saving (u_x, u_y) instead of raw rows HALVES the dominant residual
    (six [B*N, 4C] row buffers = 6.4 GB at bench shapes, which pushed the
    step past HBM at B=4); the weight FMAs fuse into the forward's
    existing corner reduction. Packed two points per 128-lane row
    ([B*N, 2C=64]-minor would tile-pad 2x).
    """
    BN = rows.shape[0]
    C = rows.shape[-1] // 4
    ix = jnp.clip(
        (coords2[..., 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0
    ).reshape(-1, 1)
    iy = jnp.clip(
        (coords2[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0
    ).reshape(-1, 1)
    x0f = jnp.minimum(jnp.floor(ix), W - 2.0)
    y0f = jnp.minimum(jnp.floor(iy), H - 2.0)
    wx1 = (ix - x0f).astype(rows.dtype)
    wy1 = (iy - y0f).astype(rows.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    r00 = rows[:, :C]
    r01 = rows[:, C : 2 * C]
    r10 = rows[:, 2 * C : 3 * C]
    r11 = rows[:, 3 * C :]
    u_x = wy0 * (r01 - r00) + wy1 * (r11 - r10)
    u_y = wx0 * (r10 - r00) + wx1 * (r11 - r01)
    assert BN % 2 == 0
    return jnp.concatenate((u_x, u_y), axis=-1).reshape(BN // 2, 4 * C)


def _coord_grad_1plane(u, coords2, g, H, W):
    """d(sample_packed)/d(coords2) from the pre-contracted residual u
    (see _make_dcoord_residual).

    u: [B*N//2, 4C] packed (u_x | u_y) pairs; coords2: [B, N, 2];
    g: [B, N, C] f32. Returns [B, N, 2] f32. Matches the autodiff of
    sample_packed, including jnp.clip's VJP convention: 1 inside, 0
    outside, and 0.5 at an EXACT boundary hit (tie-splitting) — which
    matters because the near plane puts every ray's first sample exactly
    on the AABB face (coords = +-1), ~1/S of all points (golden-tested).
    """
    B, N, C = g.shape
    uu = u.reshape(B * N, 2 * C).astype(jnp.float32)
    gf = g.reshape(-1, C).astype(jnp.float32)
    d_dix = jnp.sum(gf * uu[:, :C], axis=-1).reshape(B, N)
    d_diy = jnp.sum(gf * uu[:, C:], axis=-1).reshape(B, N)

    ix_raw = (coords2[..., 0] + 1.0) * 0.5 * (W - 1)
    iy_raw = (coords2[..., 1] + 1.0) * 0.5 * (H - 1)

    def _sat(raw, hi):
        inside = ((raw > 0.0) & (raw < hi)).astype(jnp.float32)
        edge = ((raw == 0.0) | (raw == hi)).astype(jnp.float32)
        return inside + 0.5 * edge

    in_x = _sat(ix_raw, W - 1.0)
    in_y = _sat(iy_raw, H - 1.0)
    dx = d_dix * in_x * (0.5 * (W - 1))
    dy = d_diy * in_y * (0.5 * (H - 1))
    return jnp.stack((dx, dy), axis=-1)


def _tsm_bwd(
    img_shape, table_dtype, block_shape, WY, WX, save_rows, res, g_mean
):
    from nerf_from_image_tpu.ops.triplane import (
        plane_coords,
        sample_packed_with_rows,
    )

    coords3, us, shape_token, packed = res
    Bp, three, H, W, _ = shape_token.shape
    if us is None:
        # save_rows=False: rebuild the dcoord residuals by re-gathering
        # the corner rows from the saved packed table (bit-identical to
        # the forward's gathers — same helper, same inputs).
        us = tuple(
            _make_dcoord_residual(
                sample_packed_with_rows(
                    packed[:, k], c2, per_batch_gather=True
                )[1],
                c2,
                H,
                W,
            )
            for k, c2 in enumerate(plane_coords(coords3))
        )
    u1, u2, u3 = us
    C = u1.shape[-1] // 4
    g = (g_mean / 3.0).astype(jnp.float32)

    compute_dtype = (
        jnp.bfloat16 if table_dtype == "bfloat16" else jnp.float32
    )
    d1, d2, d3 = triplane_splat_grads(
        coords3,
        g,
        H=H,
        W=W,
        block_shape=block_shape,
        img_shape=img_shape,
        WY=WY,
        WX=WX,
        compute_dtype=compute_dtype,
    )
    dplanes = jnp.stack((d1, d2, d3), axis=1).astype(shape_token.dtype)

    c_xy, c_xz, c_yz = plane_coords(coords3)
    g1 = _coord_grad_1plane(u1, c_xy, g, H, W)
    g2 = _coord_grad_1plane(u2, c_xz, g, H, W)
    g3 = _coord_grad_1plane(u3, c_yz, g, H, W)
    dx = g1[..., 0] + g2[..., 0]
    dy = g1[..., 1] + g3[..., 0]
    dz = g2[..., 1] + g3[..., 1]
    dcoords3 = jnp.stack((dx, dy, dz), axis=-1).astype(coords3.dtype)
    return dplanes, dcoords3


triplane_sample_mean.defvjp(_tsm_fwd, _tsm_bwd)
