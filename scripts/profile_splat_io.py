"""Isolates the splat kernel's input-streaming overhead by layout.

Run: python scripts/profile_splat_io.py
"""

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
N = 128 * 128 * 64
VM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def run(P, variant):
    nblocks = N // P
    NBtot = B * nblocks
    rng = np.random.default_rng(0)
    iy2 = jnp.asarray(rng.uniform(0, H - 1, (NBtot, P)).astype(np.float32))
    ix2 = jnp.asarray(rng.uniform(0, W - 1, (NBtot, P)).astype(np.float32))
    ixy = jnp.stack([iy2, ix2], axis=1)  # [NB, 2, P]
    iy3 = iy2[..., None]
    ix3 = ix2[..., None]
    g = jnp.asarray(
        rng.standard_normal((NBtot, P, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    out_spec = pl.BlockSpec(
        (1, H, W * C), lambda b, k: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((B, H, W * C), jnp.float32)

    def blockmap(b, k):
        return (b * nblocks + k, 0, 0)

    if variant == "empty":

        def kernel(out_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[0, 0:64, 0:2048] += 1.0

        fn = lambda: pl.pallas_call(
            kernel,
            grid=(B, nblocks),
            in_specs=[],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=VM,
        )()
        args = ()
    elif variant == "read_g":

        def kernel(g_ref, out_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[0, 0:1, 0:C] += jnp.sum(
                g_ref[0], axis=0, keepdims=True
            ).astype(jnp.float32)

        fn = lambda g: pl.pallas_call(
            kernel,
            grid=(B, nblocks),
            in_specs=[
                pl.BlockSpec((1, P, C), blockmap, memory_space=pltpu.VMEM)
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=VM,
        )(g)
        args = (g,)
    elif variant == "read_ixy_P1":

        def kernel(iy_ref, ix_ref, out_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            s = jnp.sum(iy_ref[0] + ix_ref[0])
            out_ref[0, 0:1, 0:1] += s[None, None]

        fn = lambda iy, ix: pl.pallas_call(
            kernel,
            grid=(B, nblocks),
            in_specs=[
                pl.BlockSpec((1, P, 1), blockmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, 1), blockmap, memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=VM,
        )(iy, ix)
        args = (iy3, ix3)
    elif variant == "read_ixy_2P":

        def kernel(ixy_ref, out_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            s = jnp.sum(ixy_ref[0])
            out_ref[0, 0:1, 0:1] += s[None, None]

        fn = lambda ixy: pl.pallas_call(
            kernel,
            grid=(B, nblocks),
            in_specs=[
                pl.BlockSpec(
                    (1, 2, P), lambda b, k: (b * nblocks + k, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=VM,
        )(ixy)
        args = (ixy,)
    elif variant == "transpose_2P":
        # [2, P] lanes-major -> per-point sublane layout via jnp transpose
        def kernel(ixy_ref, out_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            v = ixy_ref[0]  # [2, P]
            vt = v.T  # [P, 2]
            iy = vt[:, 0:1]
            ix = vt[:, 1:2]
            ylanes = jax.lax.broadcasted_iota(jnp.int32, (P, 64), 1).astype(
                jnp.float32
            )
            oy = jnp.maximum(0.0, 1.0 - jnp.abs(ylanes - iy))
            s = jnp.sum(oy + 0.0 * ix)
            out_ref[0, 0:1, 0:1] += s[None, None]

        fn = lambda ixy: pl.pallas_call(
            kernel,
            grid=(B, nblocks),
            in_specs=[
                pl.BlockSpec(
                    (1, 2, P), lambda b, k: (b * nblocks + k, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=VM,
        )(ixy)
        args = (ixy,)
    jfn = jax.jit(fn)
    try:
        t = timeit(jfn, *args, iters=4)
        print(f"  P={P} {variant:14s}: {t*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(
            f"  P={P} {variant:14s}: FAIL {str(e).splitlines()[0][:90]}",
            flush=True,
        )


def main():
    for v in ["empty", "read_g", "read_ixy_P1", "read_ixy_2P",
              "transpose_2P"]:
        run(1024, v)
    run(4096, "read_ixy_P1")
    run(4096, "empty")


if __name__ == "__main__":
    main()
