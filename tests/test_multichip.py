"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel GAN
steps, ray-sharded rendering, and sharding invariants vs single-device."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_gan_engine import random_batch, tiny_configs, tiny_models


@pytest.fixture(scope="module")
def mesh():
    from nerf_from_image_tpu.parallel import mesh as mesh_mod

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(n_data=8)


def test_dp_step_matches_single_device(mesh):
    """One data-parallel G step equals the single-device step bitwise-ish."""
    from nerf_from_image_tpu.engine import gan
    from nerf_from_image_tpu.parallel import mesh as mesh_mod

    model, disc = tiny_models()
    config, render_config = tiny_configs()
    config = dataclasses.replace(config, batch_size=8)
    state = gan.init_gan_state(config, model, disc, jax.random.key(0),
                               render_config)
    rng = np.random.default_rng(0)
    batch = random_batch(rng, 8)
    key = jax.random.key(1)

    step = jax.jit(
        lambda s, b, k: gan.g_step(config, render_config, model, disc, s, b, k)
    )
    # Single device (default placement).
    state_1, gm_1 = step(state, batch, key)

    # Data-parallel over the mesh.
    state_r = mesh_mod.replicate(mesh, state)
    batch_r = mesh_mod.shard_batch(mesh, batch)
    with jax.sharding.set_mesh(mesh):
        state_8, gm_8 = step(state_r, batch_r, key)

    np.testing.assert_allclose(
        float(gm_1["loss_g"]), float(gm_8["loss_g"]), rtol=1e-4
    )
    a = jax.tree.leaves(state_1.params_g)[0]
    b = jax.tree.leaves(state_8.params_g)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-6)


def test_shard_batch_global_batch_guard_raises(mesh):
    """The global-vs-per-host batch guard is a ValueError (survives -O)."""
    from nerf_from_image_tpu.parallel import mesh as mesh_mod

    with pytest.raises(ValueError, match="GLOBAL batch"):
        mesh_mod.shard_batch(
            mesh, {"x": np.zeros((2, 3), np.float32)}, global_batch=4
        )


def test_ray_sharded_render_matches(mesh):
    """shard_rays=True produces the same image as the unsharded render."""
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.parallel import mesh as mesh_mod

    model = Generator(
        latent_dim=32, scene_range=0.55, attention_values=0, use_sdf=True,
        w_dim=32, plane_channels=8, synthesis_resolution=16,
        channel_base=256, channel_max=32,
    )
    variables = model.init(jax.random.key(0), method="init_all")
    pose = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).at[:, 2, 3].set(2.5)
    focal = jnp.ones((1,)) * 1.2
    z = jax.random.normal(jax.random.key(1), (1, 32))

    rc = RenderConfig(resolution=16, depth_samples_per_ray=8,
                      fine_sampling=True, scene_range=0.55,
                      white_background=True, query_chunk=None)
    out_plain, _ = jax.jit(
        lambda v: render(rc, model, v, pose, focal, z)
    )(variables)

    rc_sharded = dataclasses.replace(rc, shard_rays=True)
    variables_r = mesh_mod.replicate(mesh, variables)
    with jax.sharding.set_mesh(mesh):
        out_sharded, _ = jax.jit(
            lambda v: render(rc_sharded, model, v, pose, focal, z)
        )(variables_r)

    np.testing.assert_allclose(
        np.asarray(out_sharded.rgb), np.asarray(out_plain.rgb),
        rtol=1e-4, atol=1e-5,
    )
