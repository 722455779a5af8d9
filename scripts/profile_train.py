"""Profiles the full GAN training steps (G and D phases) on the real TPU.

The reference's headline training throughput is im/s at batch 32 across
4-8 GPUs (reference: run.py:1192-1198); this measures the per-chip
jit-compiled g_step/d_step at the reference render config, in both the
strict-f32 and bf16-plane modes.

Run: python scripts/profile_train.py [batch_size] [config ...]

With config names (f32 / bf16 / bf16+noremat / bf16+splat /
bf16+splat+copts) only those rows run — use one config per process when
probing memory-heavy configurations: an OOM on this worker kills the
process rather than raising.

bf16+splat routes the G-step's MAIN render backward through the Pallas
windowed splat. This is legal first-order-only territory: path_length
differentiates only the synthesis map (planes w.r.t. ws —
engine/regularizers.py:28-55, reference models/generator.py:484-499) and
the eikonal/TV/entropy regularizers query their own stratified volume
samples through the double-backward-capable grid-sample route, so no
grad-of-grad ever crosses the splat's custom_vjp.
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
    import dataclasses

    from nerf_from_image_tpu.engine import gan
    from nerf_from_image_tpu.engine.render import RenderConfig
    from nerf_from_image_tpu.models.discriminator import Discriminator
    from nerf_from_image_tpu.models.generator import Generator

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    RES = 128

    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    disc = Discriminator(
        resolution=RES, nc=3, camera_flipped=False, conditional_pose=True
    )
    config = gan.GANTrainConfig(
        batch_size=B,
        latent_dim=512,
        white_background=False,
        augment_p=0.0,
        augment_ada=False,
        path_length_regularization=True,
        eikonal=0.1,
        tv=0.5,
        entropy=0.05,
        r1=5.0,
        use_sdf=True,
    )
    base_render = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=64,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
    )

    state = gan.init_gan_state(
        config, model, disc, jax.random.key(0), base_render
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
    images = jnp.asarray(
        rng.random((B, RES, RES, 3)).astype(np.float32) * 2 - 1
    )
    batch = {"pose": pose, "focal": focal}
    real_batch = dict(batch, images=images)

    rematpct = "63"
    for a in sys.argv[2:]:
        if a.startswith("rematpct="):
            rematpct = a.split("=", 1)[1]
    bench_copts = {
        "xla_jf_rematerialization_percent_shared_memory_limit": rematpct,
        "xla_tpu_scoped_vmem_limit_kib": "90112",
    }
    all_configs = (
        ("f32", {}, None),
        ("bf16", {"plane_dtype": "bfloat16"}, None),
        ("bf16+noremat", {"plane_dtype": "bfloat16", "query_chunk": None},
         None),
        ("bf16+splat",
         {"plane_dtype": "bfloat16", "query_chunk": None,
          "plane_splat": True, "splat_block": (16, 16, 4),
          "splat_window": (128, 128)},
         None),
        ("bf16+splat+copts",
         {"plane_dtype": "bfloat16", "query_chunk": None,
          "plane_splat": True, "splat_block": (16, 16, 4),
          "splat_window": (128, 128)},
         bench_copts),
    )
    selected = sys.argv[2:]
    configs = (
        [c for c in all_configs if c[0] in selected]
        if selected
        else [c for c in all_configs if "splat" not in c[0]]
    )
    for name, kw, copts in configs:
        render_config = dataclasses.replace(base_render, **kw)
        g_step = jax.jit(
            lambda s, b, k: gan.g_step(
                config, render_config, model, disc, s, b, k
            )
        )
        d_step = jax.jit(
            lambda s, rb, fb, k: gan.d_step(
                config, render_config, model, disc, s, rb, fb, k
            )
        )
        if copts:
            gc_ = g_step.lower(state, batch, jax.random.key(1)).compile(
                compiler_options=copts
            )
            mem = gc_.memory_analysis()
            print(
                f"[{name}] g_step temps "
                f"{getattr(mem, 'temp_size_in_bytes', 0)/2**30:.2f} GiB",
                flush=True,
            )
            g_step = gc_
            d_step = d_step.lower(
                state, real_batch, batch, jax.random.key(2)
            ).compile(compiler_options=copts)
        try:
            tg = timeit(g_step, state, batch, jax.random.key(1), iters=4,
                        warmup=1)
            td = timeit(d_step, state, real_batch, batch, jax.random.key(2),
                        iters=4, warmup=1)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] failed: {type(e).__name__}", flush=True)
            continue
        # One training iteration alternates G and D (reference: even/odd
        # iterations) — report the G+D pair as one "iteration".
        imps = B / (tg + td)
        print(
            f"[{name:>13}] g_step {tg*1e3:7.1f} ms  d_step {td*1e3:7.1f} ms"
            f"  -> {imps:6.2f} im/s/chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
