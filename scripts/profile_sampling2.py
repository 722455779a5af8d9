"""Micro-profile of the fine-pass machinery at bench shapes: weights-only
pass + smoothing, sample_pdf (gather vs masked-reduction variants), the
per-ray z-sort, and composite_dual.

Run: python scripts/profile_sampling2.py
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

from nerf_from_image_tpu.ops import compositing, sampling


def main():
    B, H, W, S = 4, 128, 128, 64
    N = B * H * W
    rng = np.random.default_rng(0)

    sigma = jnp.asarray(rng.random((B, H, W, S)).astype(np.float32)) * 5
    depths = jnp.sort(
        jnp.asarray(rng.random((B, H, W, S)).astype(np.float32)) * 3 + 1.5,
        axis=-1,
    )
    dirs = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    bins = jnp.sort(jnp.asarray(rng.random((N, S - 1)).astype(np.float32)))
    w = jnp.asarray(rng.random((N, S - 2)).astype(np.float32))

    def weights_smooth(sigma, dirs, depths):
        wts = compositing.render_volume_density_weights_only(
            sigma, dirs, depths
        )
        return compositing.smooth_weights(wts.reshape(-1, S))

    t = timeit(jax.jit(weights_smooth), sigma, dirs, depths)
    print(f"weights_only+smooth:      {t*1e3:8.2f} ms")

    t = timeit(
        jax.jit(lambda b, w: sampling.sample_pdf(b, w, S, key=None)), bins, w
    )
    print(f"sample_pdf det:           {t*1e3:8.2f} ms")

    key = jax.random.key(0)
    t = timeit(
        jax.jit(lambda b, w: sampling.sample_pdf(b, w, S, key=key)), bins, w
    )
    print(f"sample_pdf rand:          {t*1e3:8.2f} ms")

    z = jnp.asarray(rng.random((B, H, W, S)).astype(np.float32))
    t = timeit(jax.jit(lambda z: jnp.sort(z, axis=-1)), z)
    print(f"z-sort [B,H,W,S]:         {t*1e3:8.2f} ms")

    # composite_dual alone (channels: rgb 32+3-ish -> use 35)
    ch_a = {"rgb": jnp.asarray(rng.random((B, H, W, S, 35)).astype(np.float32))}
    ch_b = {"rgb": jnp.asarray(rng.random((B, H, W, S, 35)).astype(np.float32))}
    sig_b = jnp.asarray(rng.random((B, H, W, S)).astype(np.float32)) * 5
    dep_b = jnp.sort(
        jnp.asarray(rng.random((B, H, W, S)).astype(np.float32)) * 3 + 1.5,
        axis=-1,
    )

    def dual(sigma, depths, ca, sig_b, dep_b, cb, dirs):
        out = compositing.composite_dual(
            sigma, depths, {"rgb": ca}, sig_b, dep_b, {"rgb": cb}, dirs,
            white_background=False,
        )
        return out.rgb

    f = jax.jit(dual)
    t = timeit(f, sigma, depths, ch_a["rgb"], sig_b, dep_b, ch_b["rgb"], dirs)
    print(f"composite_dual fwd:       {t*1e3:8.2f} ms")

    def dual_loss(sigma, depths, ca, sig_b, dep_b, cb, dirs):
        return jnp.sum(dual(sigma, depths, ca, sig_b, dep_b, cb, dirs) ** 2)

    g = jax.jit(jax.grad(dual_loss, argnums=(0, 2, 3, 5)))
    t = timeit(g, sigma, depths, ch_a["rgb"], sig_b, dep_b, ch_b["rgb"], dirs)
    print(f"composite_dual fwd+bwd:   {t*1e3:8.2f} ms")

    # render_volume_density single-list fwd+bwd for comparison
    def single_loss(sigma, ca, dirs, depths):
        out = compositing.render_volume_density(
            sigma, ca, dirs, depths, white_background=False
        )
        return jnp.sum(out.rgb ** 2)

    g2 = jax.jit(jax.grad(single_loss, argnums=(0, 1)))
    t = timeit(g2, sigma, ch_a["rgb"], dirs, depths)
    print(f"render_volume_density f+b:{t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
