"""Sweeps RenderConfig perf knobs on the fwd+bwd ray-march benchmark.

Same measurement as bench.py, parameterized over plane_dtype / query_chunk /
merge_mode. Prints one JSON line per configuration.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

BATCH = 4
RES = 128
SAMPLES = 64
ITERS = 8


def force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def main():
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator

    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )

    rng = np.random.default_rng(0)
    mats = []
    for _ in range(BATCH):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
        mats.append(m)
    pose = jnp.asarray(np.stack(mats).astype(np.float32))
    focal = jnp.full((BATCH,), 1.2)
    ws = jax.random.normal(jax.random.key(1), (BATCH, model.num_ws, 512)) * 0.1

    dtypes = [None, "bfloat16"]
    chunks = [131072, None]
    merges = ["pairwise"]
    for dtype, chunk, merge in itertools.product(dtypes, chunks, merges):
        config = RenderConfig(
            resolution=RES,
            depth_samples_per_ray=SAMPLES,
            fine_sampling=True,
            scene_range=1.4,
            white_background=False,
            plane_dtype=dtype,
            query_chunk=chunk,
            merge_mode=merge,
        )

        def loss_fn(ws, pose):
            out, _ = render(config, model, variables, pose, focal, ws)
            return jnp.sum(jnp.square(out.rgb)) + jnp.sum(jnp.square(out.mask))

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        try:
            g = step(ws, pose)
            force(g)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                g = step(ws, pose)
            force(g)
            t1 = time.perf_counter()
        except Exception as e:  # OOM etc.
            print(json.dumps({"dtype": str(dtype), "chunk": chunk,
                              "merge": merge, "error": str(e)[:120]}))
            continue
        rays_per_s = BATCH * RES * RES * ITERS / (t1 - t0)
        print(json.dumps({
            "dtype": str(dtype), "chunk": chunk, "merge": merge,
            "rays_per_s": round(rays_per_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
