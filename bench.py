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

# TPU compiler options for the primary configuration (measured sweep:
# scripts/bench_step_config.py, 2026-08-21):
# - The splat-enabled full-gradient step lowers to 10.55 GiB of XLA temps
#   by default; this axon worker OOM-kills (instead of raising
#   RESOURCE_EXHAUSTED) above ~10.3 GiB peak. Capping the TPU
#   rematerialization budget at 63% of HBM makes the compiler remat the
#   step to 9.65 GiB — at which point remat is no longer even binding
#   (63% and 64% produce identical plans).
# - Raising the scoped-VMEM budget from the default to ~88 MiB lets
#   memory-space-assignment keep the per-batch-element gather tables
#   (16.8 MiB each) VMEM-resident: 196k vs 179k rays/s.
_COMPILER_OPTIONS = {
    "xla_jf_rematerialization_percent_shared_memory_limit": "63",
    "xla_tpu_scoped_vmem_limit_kib": "90112",
}


def main():
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator

    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    # Production perf configuration: bf16 triplane gather tables (the
    # dominant HBM cost; golden-tested against the f32 path within
    # tolerance — tests/test_triplane_packed.py), unchunked queries, and
    # the Pallas ray-coherent windowed-splat backward for the triplane
    # sampling (ops/pallas/splat.py; tests/test_splat.py) with full
    # (ws AND pose) gradients. The (128,128) window keeps BOTH passes on
    # the kernel's fast branch — the coarse pass's stratified blocks have
    # much larger plane footprints than the surface-clustered fine
    # samples, and a (128,64) window silently routed the whole coarse
    # splat to the scatter fallback (profiled: 232 ms/step of hidden
    # fallback). Strict-f32 parity mode (plane_dtype=None) measures
    # ~0.60x of the bf16 scatter path.
    config = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=SAMPLES,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
        plane_dtype="bfloat16",
        query_chunk=None,
        plane_splat=True,
        splat_block=(16, 16, 4),
        splat_window=(128, 128),
    )
    # Fallback: the round-3 configuration (XLA scatter backward, unchunked
    # bf16) — known-good on this worker at 10.26 GiB temps / 106.9k rays/s.
    fallback_config = dataclasses.replace(config, plane_splat=False)
    # Last-resort fallback: rematerialized chunks bound the memory for
    # smaller-HBM parts.
    fallback2_config = dataclasses.replace(
        fallback_config, query_chunk=131072
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

    def make_step(cfg, compiler_options=None):
        def loss_fn(ws, pose):
            out, _ = render(cfg, model, variables, pose, focal, ws)
            return jnp.sum(jnp.square(out.rgb)) + jnp.sum(
                jnp.square(out.mask)
            )

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        if compiler_options:
            return step.lower(ws, pose).compile(
                compiler_options=compiler_options
            )
        return step

    def force(out):
        # On the axon TPU platform block_until_ready returns before
        # execution finishes; only a host fetch synchronizes. Programs
        # execute in order on one device, so fetching one element of the
        # last dispatched program forces everything queued before it.
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0:1]))

    # Warmup / compile; fall back through the known-good configurations if
    # the primary one exceeds this part's HBM. Fallbacks are loudly
    # reported on stderr so a silently degraded primary config can't
    # masquerade as the headline number.
    candidates = [
        ("splat+copts", config, _COMPILER_OPTIONS),
        ("scatter-unchunked", fallback_config, None),
        ("scatter-chunked", fallback2_config, None),
    ]
    step = None
    for i, (name, cfg, copts) in enumerate(candidates):
        try:
            step = make_step(cfg, copts)
            g = step(ws, pose)
            force(g)
            break
        except Exception as e:
            import sys

            if i == len(candidates) - 1:
                raise
            print(
                f"bench: config '{name}' failed ({type(e).__name__}); "
                f"falling back to '{candidates[i + 1][0]}'",
                file=sys.stderr,
            )

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
