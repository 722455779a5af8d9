"""Component-level profile of the bench render step on real TPU.

Breaks the headline bench (B=4, 128^2 rays, 64+64 samples, fp32) into:
synthesis, field query (packed gather + MLP), sampling/sort/composite,
and sweeps query_chunk / pack_planes settings.

Run: python scripts/profile_render.py
"""

import dataclasses
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
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator

    B, RES, S = 4, 128, 64
    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    config = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=S,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )

    rng = np.random.default_rng(0)
    mats = []
    for _ in range(B):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
        mats.append(m)
    pose = jnp.asarray(np.stack(mats).astype(np.float32))
    focal = jnp.full((B,), 1.2)
    ws = jax.random.normal(jax.random.key(1), (B, model.num_ws, 512)) * 0.1

    # --- 1. synthesis alone (fwd+bwd) ---
    def synth_loss(ws):
        planes = model.apply(variables, ws, "none", None, method="synthesize")
        return jnp.sum(jnp.square(planes))

    t = timeit(jax.jit(jax.grad(synth_loss)), ws)
    print(f"synthesis fwd+bwd:           {t*1e3:8.2f} ms")

    planes = jax.jit(
        lambda ws: model.apply(variables, ws, "none", None, method="synthesize")
    )(ws)

    # --- 2. field query alone: packed gather + MLP, 1M pts/img ---
    from nerf_from_image_tpu.ops.triplane import pack_corners

    N = RES * RES * S
    pts = jax.random.uniform(
        jax.random.key(2), (B, N, 3), minval=-1.3, maxval=1.3
    )
    attn = jax.random.normal(jax.random.key(3), (B, 10, 3))

    def field_loss(planes, pts):
        packed = pack_corners(planes)
        out = model.apply(
            variables, packed, pts, outputs=("sigma", "rgb"),
            attention_values=attn,
            method="sample_field",
        )
        return jnp.sum(jnp.square(out["sigma"])) + jnp.sum(
            jnp.square(out["rgb"])
        )

    t = timeit(jax.jit(jax.grad(field_loss, argnums=(0, 1))), planes, pts)
    print(f"field query fwd+bwd (B4x1M): {t*1e3:8.2f} ms  "
          f"{B*N/t/1e6:7.1f} Mpts/s")

    def field_fwd(planes, pts):
        packed = pack_corners(planes)
        return model.apply(
            variables, packed, pts, outputs=("sigma", "rgb"),
            attention_values=attn,
            method="sample_field",
        )

    t = timeit(jax.jit(field_fwd), planes, pts)
    print(f"field query fwd     (B4x1M): {t*1e3:8.2f} ms  "
          f"{B*N/t/1e6:7.1f} Mpts/s")

    # --- 3. full render sweeps ---
    def bench_cfg(cfg):
        def loss_fn(ws, pose):
            out, _ = render(cfg, model, variables, pose, focal, ws)
            return jnp.sum(jnp.square(out.rgb)) + jnp.sum(
                jnp.square(out.mask)
            )

        return jax.jit(jax.grad(loss_fn, argnums=(0, 1)))

    rays = B * RES * RES
    variants = [
        ("base (pairwise,f32)", {}),
        ("sort merge", {"merge_mode": "sort"}),
        ("bf16 planes", {"plane_dtype": "bfloat16"}),
        ("bf16 + chunk256k", {"plane_dtype": "bfloat16",
                              "query_chunk": 262144}),
        ("no fine pass", {"fine_sampling": False}),
        ("bf16 nofine", {"plane_dtype": "bfloat16",
                         "fine_sampling": False}),
    ]
    for name, kw in variants:
        cfg = dataclasses.replace(config, **kw)
        try:
            t = timeit(bench_cfg(cfg), ws, pose, iters=4, warmup=1)
        except Exception as e:  # noqa: BLE001 — OOM at large chunks
            print(f"render fwd+bwd {name:>18}:   failed ({type(e).__name__})")
            continue
        print(f"render fwd+bwd {name:>18}: {t*1e3:8.2f} ms  "
              f"{rays/t:8.0f} rays/s")

    # fwd only
    def fwd(ws, pose):
        out, _ = render(config, model, variables, pose, focal, ws)
        return out.rgb

    t = timeit(jax.jit(fwd), ws, pose, iters=4, warmup=1)
    print(f"render fwd only:             {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
