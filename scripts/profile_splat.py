"""Ablates the splat kernel's stages to find the bottleneck.

Run: python scripts/profile_splat.py
"""

import functools
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timing import timeit

B, H, W, C = 4, 256, 256, 32
N = 128 * 128 * 64  # pts per batch elem


def run(P, WY, WX, stage, vmem_mb=None):
    nblocks = N // P
    NBtot = B * nblocks
    rng = np.random.default_rng(0)
    iy = jnp.asarray(
        rng.uniform(0, H - 1, (NBtot, P, 1)).astype(np.float32)
    )
    ix = jnp.asarray(
        rng.uniform(0, W - 1, (NBtot, P, 1)).astype(np.float32)
    )
    g = jnp.asarray(
        rng.standard_normal((NBtot, P, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    oy0 = jnp.asarray(
        rng.integers(0, (H - WY) // 8, NBtot).astype(np.int32) * 8
    )
    ox0 = jnp.asarray(
        rng.integers(0, (W - WX) // 4, NBtot).astype(np.int32) * 4
    )
    ok = jnp.ones((NBtot,), jnp.int32)

    def kernel(oy0_ref, ox0_ref, ok_ref, iy_ref, ix_ref, g_ref, out_ref):
        b = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _zero():
            out_ref[...] = jnp.zeros_like(out_ref)

        blk = b * nblocks + k
        oy0 = oy0_ref[blk]
        ox0 = ox0_ref[blk]
        iy = iy_ref[0]
        ix = ix_ref[0]
        g = g_ref[0]
        x0f = jnp.minimum(jnp.floor(ix), W - 2.0)
        y0f = jnp.minimum(jnp.floor(iy), H - 2.0)
        wy1 = iy - y0f
        wx1 = ix - x0f
        yl0 = y0f - oy0.astype(jnp.float32)
        xl0 = x0f - ox0.astype(jnp.float32)
        ylanes = jax.lax.broadcasted_iota(jnp.int32, (P, WY), 1).astype(
            jnp.float32
        )
        oy = jnp.maximum(0.0, 1.0 - jnp.abs(ylanes - yl0 - wy1)).astype(
            jnp.bfloat16
        )
        if stage == "oy_only":
            T = jax.lax.dot_general(
                oy,
                oy,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, 0:WY, 0:WY] += T
            return
        if stage == "bf16build":
            lxs = (
                jax.lax.broadcasted_iota(jnp.int32, (P, WX * C), 1) // C
            ).astype(jnp.bfloat16)
            xc = (xl0 + wx1).astype(jnp.bfloat16)
            zx = jnp.maximum(
                jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(lxs - xc)
            )
        else:
            lxs = (
                jax.lax.broadcasted_iota(jnp.int32, (P, WX * C), 1) // C
            ).astype(jnp.float32)
            zx = jnp.maximum(0.0, 1.0 - jnp.abs(lxs - xl0 - wx1)).astype(
                jnp.bfloat16
            )
        if stage == "no_tile":
            Z = zx
        elif stage == "dottile":
            tilemat = (
                jax.lax.broadcasted_iota(jnp.int32, (C, WX * C), 1) % C
                == jax.lax.broadcasted_iota(jnp.int32, (C, WX * C), 0)
            ).astype(jnp.bfloat16)
            gt = jax.lax.dot_general(
                g, tilemat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            Z = zx * gt
        else:
            gt = jnp.tile(g, (1, WX))
            Z = zx * gt
        if stage == "z_only":
            out_ref[0, 0:1, 0 : WX * C] += jnp.sum(
                Z, axis=0, keepdims=True
            ).astype(jnp.float32)
            return
        T = jax.lax.dot_general(
            oy,
            Z,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if stage == "static_store":
            out_ref[0, 0:WY, 0 : WX * C] += T
        else:
            row0 = pl.multiple_of(oy0, 8)
            lane0 = pl.multiple_of(ox0 * C, 128)
            out_ref[0, pl.ds(row0, WY), pl.ds(lane0, WX * C)] += T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, P, 1), lambda b, k, *_: (b * nblocks + k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, P, 1), lambda b, k, *_: (b * nblocks + k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, P, C), lambda b, k, *_: (b * nblocks + k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W * C), lambda b, k, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        if vmem_mb
        else None
    )
    fn = jax.jit(
        lambda oy0, ox0, ok, iy, ix, g: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, H, W * C), jnp.float32),
            compiler_params=params,
        )(oy0, ox0, ok, iy, ix, g)
    )
    try:
        t = timeit(fn, oy0, ox0, ok, iy, ix, g, iters=4)
        print(f"  P={P} WY={WY} WX={WX} stage={stage:13s} vmem={vmem_mb}: {t*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"  P={P} WY={WY} WX={WX} stage={stage:13s} vmem={vmem_mb}: FAIL {str(e).splitlines()[0][:90]}", flush=True)


def main():
    for stage in ["full", "static_store", "no_tile", "z_only", "oy_only",
                  "bf16build", "dottile"]:
        run(1024, 64, 64, stage, vmem_mb=64)
    run(1024, 64, 48, "full", vmem_mb=64)
    run(1024, 64, 48, "bf16build", vmem_mb=64)
    run(1024, 64, 32, "bf16build", vmem_mb=64)
    run(2048, 64, 64, "bf16build", vmem_mb=64)
    run(2048, 128, 64, "bf16build", vmem_mb=100)


if __name__ == "__main__":
    main()
