"""Microbenchmarks to locate the ray-march bottleneck on TPU.

Run: python scripts/profile_raymarch.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B, N, C = 1, 1 << 20, 32
    H = W = 256
    key = jax.random.key(0)
    plane = jax.random.normal(key, (H * W, C))
    idx = jax.random.randint(key, (N,), 0, H * W)
    g = jax.random.normal(key, (N, C))

    # 1. Pure row gather.
    gather = jax.jit(lambda p, i: jnp.take(p, i, axis=0))
    t = timeit(gather, plane, idx)
    print(f"gather  (N={N}, C={C}): {t*1e3:8.2f} ms  "
          f"{N/t/1e6:9.1f} Mrows/s  {N*C*4/t/1e9:6.1f} GB/s")

    # 2. Scatter-add (gather VJP).
    scatter = jax.jit(
        lambda p, i, g: jnp.zeros_like(p).at[i].add(g)
    )
    t = timeit(scatter, plane, idx, g)
    print(f"scatter (N={N}, C={C}): {t*1e3:8.2f} ms  "
          f"{N/t/1e6:9.1f} Mrows/s")

    # 3. Small MLP (the decoder): N x 32 -> 64 -> 33.
    w1 = jax.random.normal(key, (C, 64))
    w2 = jax.random.normal(key, (64, 33))
    x = jax.random.normal(key, (N, C))
    mlp = jax.jit(
        lambda x: jax.nn.softplus(x @ w1) @ w2
    )
    t = timeit(mlp, x)
    flops = 2 * N * (C * 64 + 64 * 33)
    print(f"mlp     (N={N}):        {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TF/s")

    # 4. MLP fwd+bwd.
    mlp_grad = jax.jit(jax.grad(lambda x: (jax.nn.softplus(x @ w1) @ w2).sum()))
    t = timeit(mlp_grad, x)
    print(f"mlp bwd (N={N}):        {t*1e3:8.2f} ms")

    # 5. Full grid_sample_2d fwd.
    from nerf_from_image_tpu.ops.grid_sample import grid_sample_2d

    table = jax.random.normal(key, (B, H, W, C))
    coords = jax.random.uniform(key, (B, N, 2), minval=-1, maxval=1)
    gs = jax.jit(grid_sample_2d)
    t = timeit(gs, table, coords)
    print(f"grid_sample fwd:        {t*1e3:8.2f} ms  {N/t/1e6:9.1f} Mpts/s")

    # 6. grid_sample fwd+bwd (incl. scatter into table).
    gs_grad = jax.jit(
        jax.grad(lambda tb, c: grid_sample_2d(tb, c).sum(), argnums=(0, 1))
    )
    t = timeit(gs_grad, table, coords)
    print(f"grid_sample fwd+bwd:    {t*1e3:8.2f} ms  {N/t/1e6:9.1f} Mpts/s")

    # 7. Full field query fwd+bwd at bench scale via the render path pieces:
    # 3 planes, mean, MLP.
    from nerf_from_image_tpu.ops import grid_sample as gsm

    planes3 = jax.random.normal(key, (B, 3, H, W, C))
    pts = jax.random.uniform(key, (B, N, 3), minval=-1, maxval=1)

    def field(planes3, pts):
        e1 = gsm.grid_sample_2d(planes3[:, 0], pts[..., jnp.array([0, 1])])
        e2 = gsm.grid_sample_2d(planes3[:, 1], pts[..., jnp.array([0, 2])])
        e3 = gsm.grid_sample_2d(planes3[:, 2], pts[..., jnp.array([1, 2])])
        f = (e1 + e2 + e3) / 3
        return (jax.nn.softplus(f @ w1) @ w2).sum()

    t = timeit(jax.jit(jax.grad(field, argnums=(0, 1))), planes3, pts)
    print(f"field fwd+bwd:          {t*1e3:8.2f} ms  {N/t/1e6:9.1f} Mpts/s")


if __name__ == "__main__":
    main()
