"""Micro-profiles the fine-sampling machinery on TPU: EG3D weight smoothing,
inverse-CDF sample_pdf (take_along_axis vs masked-reduce variants), and the
dual-list composite — the non-field-query part of the fine pass.

Run: python scripts/profile_sampling.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from timing import timeit


def main():
    from nerf_from_image_tpu.ops import compositing, sampling

    B, H, W, S = 4, 128, 128, 64
    N = B * H * W
    rng = np.random.default_rng(0)
    weights = jnp.asarray(rng.random((N, S)).astype(np.float32))
    bins = jnp.asarray(
        np.sort(rng.random((N, S - 1)).astype(np.float32) * 3 + 1, axis=-1)
    )

    t = timeit(jax.jit(compositing.smooth_weights), weights)
    print(f"smooth_weights fwd:        {t*1e3:8.2f} ms")

    pdf = jax.jit(lambda b, w: sampling.sample_pdf(b, w[..., 1:-1], S))
    t = timeit(pdf, bins, weights)
    print(f"sample_pdf fwd:            {t*1e3:8.2f} ms")

    # composite_dual vs sorted merge, fwd+bwd
    sigma_a = jnp.asarray(
        np.abs(rng.standard_normal((B, H, W, S))).astype(np.float32) * 3
    )
    sigma_b = jnp.asarray(
        np.abs(rng.standard_normal((B, H, W, S))).astype(np.float32) * 3
    )
    rgb_a = jnp.asarray(rng.random((B, H, W, S, 3)).astype(np.float32))
    rgb_b = jnp.asarray(rng.random((B, H, W, S, 3)).astype(np.float32))
    depth_a = jnp.asarray(
        np.sort(rng.random((B, H, W, S)).astype(np.float32) * 3 + 1, axis=-1)
    )
    depth_b = jnp.asarray(
        np.sort(rng.random((B, H, W, S)).astype(np.float32) * 3 + 1, axis=-1)
    )
    dirs = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))

    def dual_loss(sa, ra, sb, rb):
        o = compositing.composite_dual(
            sa, depth_a, {"rgb": ra}, sb, depth_b, {"rgb": rb}, dirs,
            white_background=False,
        )
        return jnp.sum(o.rgb**2) + jnp.sum(o.mask) + jnp.sum(o.depth)

    t = timeit(jax.jit(dual_loss), sigma_a, rgb_a, sigma_b, rgb_b)
    print(f"composite_dual fwd:        {t*1e3:8.2f} ms")
    t = timeit(
        jax.jit(jax.grad(dual_loss, argnums=(0, 1, 2, 3))),
        sigma_a, rgb_a, sigma_b, rgb_b,
    )
    print(f"composite_dual fwd+bwd:    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
