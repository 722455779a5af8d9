"""Profiles the bootstrap-encoder training step on TPU: EMA-generator
render (data generation, fwd-only) + SegFormer-B5 fwd+bwd.

Run: python scripts/profile_encoder.py
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

B, RES = 4, 128


def main():
    from nerf_from_image_tpu.engine import coord_regressor as cr
    from nerf_from_image_tpu.engine.render import RenderConfig
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder
    from nerf_from_image_tpu.models.generator import Generator

    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    gen_vars = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    encoder = BootstrapEncoder(latent_dim=512)
    config = cr.CoordRegressorConfig(batch_size=B, latent_dim=512)
    state = cr.init_coord_state(config, encoder, jax.random.key(1))
    render_config = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=64,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
        compute_coords=True,
        plane_dtype="bfloat16",
    )

    # Encoder fwd+bwd alone.
    imgs = jnp.asarray(
        np.random.default_rng(0).random((B, RES, RES, 3)).astype(np.float32)
    )
    tgt_c = jnp.zeros((B, RES, RES, 3))
    tgt_m = jnp.zeros((B, RES, RES))
    tgt_w = jnp.zeros((B, 512))

    def enc_loss(params, imgs):
        pc, pm, pw = encoder.apply(
            {"params": params}, imgs, deterministic=True
        )
        l, _ = cr.coord_losses(pc, pm, pw, tgt_c, tgt_m, tgt_w, config)
        return l

    t = timeit(jax.jit(jax.grad(enc_loss)), state.params, imgs)
    print(f"SegFormer-B5 fwd+bwd  (B={B}, {RES}^2): {t*1e3:8.1f} ms "
          f"-> {B/t:5.2f} im/s")

    # Full train step (render data-gen + encoder update).
    rng = np.random.default_rng(1)
    mats = []
    for _ in range(B):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
        mats.append(m)
    batch = {
        "pose": jnp.asarray(np.stack(mats).astype(np.float32)),
        "focal": jnp.full((B,), 1.2),
    }
    step = jax.jit(
        lambda s, b, k: cr.coord_train_step(
            config, render_config, model, gen_vars, encoder, s, b, k
        )
    )
    t = timeit(step, state, batch, jax.random.key(2))
    print(f"full coord step       (B={B}, {RES}^2): {t*1e3:8.1f} ms "
          f"-> {B/t:5.2f} im/s")


if __name__ == "__main__":
    main()
