"""Isolates triplane gather forward vs backward (scatter-add) cost on TPU.

The field query's gather reads B*N rows from a [H*W, 4C] packed table; its
VJP is a scatter-add of the same rows. This script measures each side
separately at bench shapes, plus variants (bf16 rows, unpacked 4-gather,
sorted-index scatter) to guide kernel work.

Run: python scripts/profile_gather.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from timing import timeit


def main():
    B, H, W, C = 4, 256, 256, 32
    N = 128 * 128 * 64  # points per image per pass
    R = B * H * W
    rows_total = B * N  # one packed gather per plane per point

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((R, 4 * C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, size=(rows_total,)).astype(np.int32))
    g_out = jnp.asarray(
        rng.standard_normal((rows_total, 4 * C)).astype(np.float32)
    )
    weights = jnp.asarray(
        rng.standard_normal((rows_total, 4)).astype(np.float32)
    )

    def gather_sum(table, idx, g_out):
        return jnp.sum(jnp.take(table, idx, axis=0, mode="clip") * g_out)

    t = timeit(jax.jit(gather_sum), table, idx, g_out)
    print(f"gather fwd   [4M x 128 f32]: {t*1e3:8.2f} ms "
          f"{rows_total/t/1e6:8.1f} Mrows/s")

    grad = jax.jit(jax.grad(gather_sum))
    t = timeit(grad, table, idx, g_out)
    print(f"gather f+bwd [4M x 128 f32]: {t*1e3:8.2f} ms "
          f"{rows_total/t/1e6:8.1f} Mrows/s")

    # scatter alone via .at[].add
    def scatter(g, idx):
        return jnp.zeros((R, 4 * C), jnp.float32).at[idx].add(g)

    t = timeit(jax.jit(scatter), g_out, idx)
    print(f"scatter-add  [4M x 128 f32]: {t*1e3:8.2f} ms "
          f"{rows_total/t/1e6:8.1f} Mrows/s")

    # scatter with pre-sorted indices (spatial coherence upper bound)
    idx_sorted = jnp.sort(idx)
    def scatter_sorted(g, idx_sorted):
        return jnp.zeros((R, 4 * C), jnp.float32).at[idx_sorted].add(g)

    t = timeit(jax.jit(scatter_sorted), g_out, idx_sorted)
    print(f"scatter-add sorted idx:      {t*1e3:8.2f} ms "
          f"{rows_total/t/1e6:8.1f} Mrows/s")

    # bf16 table gather
    table_bf = table.astype(jnp.bfloat16)
    g_bf = g_out.astype(jnp.bfloat16)

    def gather_bf(table_bf, idx, g_out):
        return jnp.sum(
            jnp.take(table_bf, idx, axis=0, mode="clip").astype(jnp.float32)
            * g_out
        )

    t = timeit(jax.jit(gather_bf), table_bf, idx, g_out)
    print(f"gather fwd   [4M x 128 bf16]:{t*1e3:8.2f} ms "
          f"{rows_total/t/1e6:8.1f} Mrows/s")

    def scatter_bf(g, idx):
        return jnp.zeros((R, 4 * C), jnp.bfloat16).at[idx].add(g)

    t = timeit(jax.jit(scatter_bf), g_bf, idx)
    print(f"scatter-add  [4M x 128 bf16]:{t*1e3:8.2f} ms "
          f"{rows_total/t/1e6:8.1f} Mrows/s")

    # corner-weighted FMA on gathered rows (the VPU side of sample_packed)
    def fma(table, idx, weights):
        rows = jnp.take(table, idx, axis=0, mode="clip")
        out = (
            rows[:, :C] * weights[:, :1]
            + rows[:, C : 2 * C] * weights[:, 1:2]
            + rows[:, 2 * C : 3 * C] * weights[:, 2:3]
            + rows[:, 3 * C :] * weights[:, 3:4]
        )
        return jnp.sum(out)

    t = timeit(jax.jit(fma), table, idx, weights)
    print(f"gather+cornerFMA fwd:        {t*1e3:8.2f} ms")
    t = timeit(jax.jit(jax.grad(fma)), table, idx, weights)
    print(f"gather+cornerFMA fwd+bwd:    {t*1e3:8.2f} ms")

    # sort-merge gather at render shapes: [B*128*128, 2S] permutation rows of
    # 37 channels
    S2 = 128
    rays_n = 4 * 128 * 128
    vals = jnp.asarray(
        rng.standard_normal((rays_n * S2, 40)).astype(np.float32)
    )
    order = jnp.asarray(
        np.argsort(rng.standard_normal((rays_n, S2)), axis=-1).astype(
            np.int32
        )
    )
    row_off = jnp.arange(rays_n, dtype=jnp.int32)[:, None] * S2

    def merge(vals, order):
        gidx = (order + row_off).reshape(-1)
        return jnp.sum(jnp.take(vals, gidx, axis=0, mode="clip") ** 2)

    t = timeit(jax.jit(merge), vals, order)
    print(f"sortmerge gather fwd:        {t*1e3:8.2f} ms")
    t = timeit(jax.jit(jax.grad(merge)), vals, order)
    print(f"sortmerge gather fwd+bwd:    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
