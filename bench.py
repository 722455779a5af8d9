"""Headline benchmark: forward+backward ray-march throughput (rays/s/chip).

Measures the fully differentiable render (triplane synthesis + coarse/fine
field queries + compositing) with gradients w.r.t. latents AND camera pose —
the inner loop of hybrid inversion and GAN training — at the reference
configuration (128^2 rays, 64 coarse + 64 fine samples; reference:
arguments.py:36-39, run.py:511-514).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured against the round-1 pure-XLA fp32 implementation
on one TPU v5e chip (the first recorded value of this benchmark); the
reference repo publishes no throughput numbers (BASELINE.md).
"""

import dataclasses
import json
import os
import time

import numpy as np

import jax

# Persistent compilation cache: repeated bench runs skip the (minutes-long)
# XLA compile.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

# Round-1 pure-XLA fp32 rays/s on 1x TPU v5e (recorded after first bench run;
# serves as the fixed baseline all later rounds are compared against).
BASELINE_RAYS_PER_S = 11735.0  # measured 2026-08-17, pure-XLA fp32, chunk+remat

BATCH = 4
RES = 128
SAMPLES = 64
ITERS = 8


def main():
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator

    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    # Production perf configuration: bf16 triplane gather tables (the
    # dominant HBM cost; golden-tested against the f32 path within
    # tolerance — tests/test_triplane_packed.py). query_chunk=None stores
    # the bf16 gather residuals instead of rematerializing them — at bench
    # shapes they fit HBM and the backward skips the second gather pass
    # (+11% — scripts/bench_sweep.py); the chunked config is the fallback
    # for smaller-memory parts. Strict-f32 parity mode (plane_dtype=None)
    # measures ~0.60x of this.
    config = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=SAMPLES,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
        plane_dtype="bfloat16",
        query_chunk=None,
        # plane_splat=True enables the round-3 Pallas windowed-splat
        # backward (ops/pallas/splat.py; 3.4x the XLA scatter it replaces,
        # measured standalone at bench shapes in scripts/bench_splat.py).
        # Disabled pending an axon-platform workaround: a pallas VMEM-block
        # output >= ~1MB embedded in a large XLA program crashes the TPU
        # worker on this tunnel (bisected in scripts/bench_splat.py notes;
        # HBM-space outputs via explicit DMA are the fix in progress).
        plane_splat=False,
    )
    fallback_config = dataclasses.replace(
        config, query_chunk=131072, plane_splat=False
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

    def make_step(cfg):
        def loss_fn(ws, pose):
            out, _ = render(cfg, model, variables, pose, focal, ws)
            return jnp.sum(jnp.square(out.rgb)) + jnp.sum(
                jnp.square(out.mask)
            )

        return jax.jit(jax.grad(loss_fn, argnums=(0, 1)))

    def force(out):
        # On the axon TPU platform block_until_ready returns before
        # execution finishes; only a host fetch synchronizes. Programs
        # execute in order on one device, so fetching one element of the
        # last dispatched program forces everything queued before it.
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0:1]))

    # Warmup / compile; fall back to rematerialized chunks if the
    # unchunked residuals exceed this part's HBM. The fallback is loudly
    # reported on stderr so a silently degraded primary config can't
    # masquerade as the headline number.
    step = make_step(config)
    try:
        g = step(ws, pose)
        force(g)
    except Exception as e:
        import sys

        print(
            f"bench: query_chunk=None failed ({type(e).__name__}); "
            f"falling back to query_chunk={fallback_config.query_chunk}",
            file=sys.stderr,
        )
        step = make_step(fallback_config)
        g = step(ws, pose)
        force(g)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        g = step(ws, pose)
    force(g)
    t1 = time.perf_counter()

    rays = BATCH * RES * RES * ITERS
    rays_per_s = rays / (t1 - t0)
    vs_baseline = (
        rays_per_s / BASELINE_RAYS_PER_S if BASELINE_RAYS_PER_S else 1.0
    )
    print(
        json.dumps(
            {
                "metric": "raymarch_fwdbwd_rays_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
