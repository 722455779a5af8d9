"""Profiles the jit-compiled inversion loop on the real TPU.

The reference's headline inversion metric is s/img at 30 Adam steps with
the crop-augmented VGG loss (reference: run.py:2319-2323, demo protocol
batch 16 over 4 GPUs => 4/GPU). This measures the full-size generator at
the reference configuration: the WHOLE 30-step optimization is one XLA
program (lax.scan), so the number includes every render, LPIPS forward,
backward, and Adam update.

Run: python scripts/profile_invert.py [batch] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from timing import timeit


def main():
    from nerf_from_image_tpu.engine import inversion as inv_mod
    from nerf_from_image_tpu.engine.render import RenderConfig
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.models.lpips import LPIPS

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    RES = 128

    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    lpips_model = LPIPS()
    lpips_vars = lpips_model.init(
        jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
        jnp.zeros((1, RES, RES, 3)),
    )

    config = inv_mod.InversionConfig(steps=STEPS, loss="vgg")
    # (plane_dtype, plane_splat, query_chunk, label): the last row is the
    # --plane_splat driver configuration (Pallas windowed-splat backward,
    # unchunked) measured against the round-3 bf16 scatter baseline.
    configs = [
        (None, False, 131072, "f32", None),
        ("bfloat16", False, 131072, "bf16", None),
        ("bfloat16", True, None, "bf16+splat", None),
        # bench.py's compiler options (scoped-VMEM gather-table pinning +
        # remat budget): measured on the inversion program too.
        (
            "bfloat16", True, None, "bf16+splat+copts",
            {
                "xla_jf_rematerialization_percent_shared_memory_limit": "63",
                "xla_tpu_scoped_vmem_limit_kib": "90112",
            },
        ),
    ]
    for plane_dtype, plane_splat, query_chunk, label, copts in configs:
        render_config = RenderConfig(
            resolution=RES,
            depth_samples_per_ray=64,
            fine_sampling=True,
            scene_range=1.4,
            white_background=False,
            plane_dtype=plane_dtype,
            plane_splat=plane_splat,
            query_chunk=query_chunk,
        )
        invert_jit = jax.jit(
            inv_mod.make_invert_fn(
                config, render_config, model, variables, lpips_model,
                lpips_vars,
            ),
            static_argnames=("n_steps",),
        )
        invert = invert_jit

        rng = np.random.default_rng(0)
        poses = []
        for _ in range(B):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            m = np.eye(4)
            m[:3, :3] = q
            m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
            poses.append(m)
        pose = jnp.asarray(np.stack(poses).astype(np.float32))
        focal = jnp.full((B,), 1.2)
        params = inv_mod.pose_params_from_matrix(pose, focal, False)
        z0 = jax.random.normal(jax.random.key(2), (B, model.num_ws, 512)) / 5.0
        target = jax.random.uniform(
            jax.random.key(3), (B, RES, RES, 3), minval=-1.0, maxval=1.0
        )

        if copts:
            try:
                invert = invert_jit.lower(
                    z0, params, target, jax.random.key(4), n_steps=STEPS
                ).compile(compiler_options=copts)
                invert = (lambda c: lambda z, p, tg, k, n_steps: c(
                    z, p, tg, k
                ))(invert)
            except Exception as e:  # options are a bonus, not a gate
                print(f"[{label}] compile with options failed: {e!r}")
                continue

        def run(z0, params, target, key):
            z_f, pose_f, losses = invert(
                z0, params, target, key, n_steps=STEPS
            )
            return losses

        t = timeit(run, z0, params, target, jax.random.key(4), iters=3)
        print(
            f"[{label:>8}] {STEPS}-step inversion B={B}: {t * 1e3:9.1f} ms"
            f"  ->  {B * STEPS / t:7.1f} step-imgs/s, {t / B:6.3f} s/img"
        )


if __name__ == "__main__":
    main()
