"""Measures PnP foreground compaction (pose/pnp.py _compact_foreground).

The driving evals run known-K PnP per object and the inversion driver runs
focal-search PnP per batch; without compaction the DLT/Gauss-Newton
matmuls process all H*W rows per focal guess even though the mask zeroes
most weights. Run: python scripts/bench_pnp.py  (TPU or CPU).
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

from nerf_from_image_tpu.pose import pnp

B, H, W = 8, 128, 128
K_FOCALS = 13  # reference percentile grid, lib/pose_estimation.py:238-247


def main():
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(
        np.float32))
    # ~25% foreground, central blob (typical crop statistics).
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    masks = jnp.asarray(((xx**2 + yy**2) < 0.35).astype(np.float32))
    masks = jnp.broadcast_to(masks, (B, H, W))
    guesses = jnp.asarray(np.linspace(0.8, 3.0, K_FOCALS).astype(np.float32))

    for mp in (None, 8192, 4096):
        fn = jax.jit(lambda c, m: pnp.compute_pose_pnp(c, m, guesses,
                                                       max_points=mp))
        t = timeit(fn, coords, masks, iters=8)
        print(f"compute_pose_pnp max_points={mp}: {t*1e3:8.2f} ms "
              f"({t*1e3/B:.2f} ms/sample, {K_FOCALS} focals)")

    Ks = jnp.broadcast_to(
        jnp.asarray([[1.3, 0, 0], [0, 1.3, 0], [0, 0, 1.0]],
                    jnp.float32), (B, 3, 3))
    for mp in (None, 8192, 4096):
        fn = jax.jit(lambda c, m: pnp.compute_pose_pnp_known_k(
            c, m, Ks, max_points=mp))
        t = timeit(fn, coords, masks, iters=8)
        print(f"compute_pose_pnp_known_k max_points={mp}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
