"""Bisects the remaining bf16 render step: field query fwd+bwd at full
bench point count, gather/FMA/MLP split, and the non-query remainder.

Run: python scripts/profile_query.py
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
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.ops.triplane import (
        pack_corners,
        plane_coords,
        sample_packed,
    )

    B = 4
    N = 128 * 128 * 64  # one sampling pass per image (x2 for coarse+fine)
    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.standard_normal((B, 3, 256, 256, 32)).astype(np.float32)
    )
    pts = jnp.asarray(
        (rng.random((B, N, 3)) * 2 - 1).astype(np.float32)
    )

    packed_bf = jax.jit(
        lambda p: pack_corners(p.astype(jnp.bfloat16))
    )(planes)

    # 1. gather+corner FMA alone (3 planes), fwd and fwd+bwd wrt planes+pts.
    def gather_fma(packed, pts):
        c_xy, c_xz, c_yz = plane_coords(pts)
        f = (
            sample_packed(packed[:, 0], c_xy)
            + sample_packed(packed[:, 1], c_xz)
            + sample_packed(packed[:, 2], c_yz)
        )
        return f / 3.0

    t = timeit(jax.jit(gather_fma), packed_bf, pts)
    print(f"gather+FMA fwd   (8.4M pts bf16): {t*1e3:8.2f} ms")

    def gf_loss(packed, pts):
        return jnp.sum(gather_fma(packed, pts) ** 2)

    t = timeit(jax.jit(jax.grad(gf_loss, argnums=(0, 1))), packed_bf, pts)
    print(f"gather+FMA f+bwd (8.4M pts bf16): {t*1e3:8.2f} ms")

    # 2. full field query (gather + MLP heads) fwd+bwd.
    attn = jnp.asarray(rng.standard_normal((B, 10, 3)).astype(np.float32))

    def query(packed, pts):
        out = model.apply(
            variables, packed, pts, attention_values=attn,
            outputs=("sigma", "rgb"), method="sample_field",
        )
        return jnp.sum(out["sigma"] ** 2) + jnp.sum(out["rgb"] ** 2)

    try:
        t = timeit(jax.jit(jax.value_and_grad(query, argnums=(0, 1))),
                   packed_bf, pts)
        print(f"field query f+bwd(8.4M pts bf16): {t*1e3:8.2f} ms")
    except Exception as e:
        print("field query failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
