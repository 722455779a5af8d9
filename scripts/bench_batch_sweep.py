"""Sweep batch size / chunking for the headline bench step (rays/s/chip).

The reference trains 32 images over 4-8 GPUs = 4-8 per device
(README Training section), so any B in [4, 8] is a faithful per-chip
workload. Measures which (B, query_chunk) maximizes rays/s on one chip.

Run: python scripts/bench_batch_sweep.py
"""

import dataclasses
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
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator

    RES, S = 128, 64
    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    base = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=S,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
        plane_dtype="bfloat16",
        query_chunk=None,
    )

    def make_inputs(B):
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
        ws = jax.random.normal(
            jax.random.key(1), (B, model.num_ws, 512)
        ) * 0.1
        return ws, pose, focal

    for B, chunk in [
        (4, None),
        (6, None),
        (8, None),
        (8, 262144),
        (8, 131072),
        (16, 131072),
    ]:
        cfg = dataclasses.replace(base, query_chunk=chunk)
        ws, pose, focal = make_inputs(B)

        def loss_fn(ws, pose):
            out, _ = render(cfg, model, variables, pose, focal, ws)
            return jnp.sum(jnp.square(out.rgb)) + jnp.sum(
                jnp.square(out.mask)
            )

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        try:
            t = timeit(step, ws, pose, iters=4, warmup=1)
        except Exception as e:  # noqa: BLE001
            print(f"B={B:2d} chunk={chunk}: failed ({type(e).__name__})")
            continue
        rays = B * RES * RES
        print(
            f"B={B:2d} chunk={str(chunk):>7}: {t*1e3:8.2f} ms  "
            f"{rays/t:9.0f} rays/s"
        )


if __name__ == "__main__":
    main()
