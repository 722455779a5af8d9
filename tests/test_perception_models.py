"""Structure/property tests for LPIPS, FID InceptionV3, and the
coordinate-regressor training step (pretrained weights are not available in
this environment; numeric parity is enforced at the weight-loader level via
shape-checked key mapping)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestLPIPS:
    @pytest.fixture(scope="class")
    def lpips(self):
        from nerf_from_image_tpu.models.lpips import LPIPS

        model = LPIPS()
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x, x)
        return model, variables

    def test_zero_for_identical(self, lpips):
        model, variables = lpips
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1)
        d = model.apply(variables, x, x)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    def test_positive_and_monotone(self, lpips):
        model, variables = lpips
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32) * 2 - 1)
        small = x + 0.01 * jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        )
        big = x + 0.5 * jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        )
        d_small = float(model.apply(variables, x, small)[0, 0])
        d_big = float(model.apply(variables, x, big)[0, 0])
        assert 0 < d_small < d_big

    def test_cached_features_equal_direct(self, lpips):
        model, variables = lpips
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        b = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        fb = model.apply(variables, b, method="features")
        d1 = model.apply(variables, a, b)
        d2 = model.apply(variables, a, fb)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)

    def test_gradients_flow(self, lpips):
        model, variables = lpips
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        b = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        g = jax.grad(lambda a: model.apply(variables, a, b).sum())(a)
        assert float(jnp.abs(g).sum()) > 0


class TestInception:
    def test_shapes_and_determinism(self):
        from nerf_from_image_tpu.models.inception import FIDInceptionV3

        model = FIDInceptionV3()
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x)
        rng = np.random.default_rng(0)
        im = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        act = model.apply(variables, im)
        assert act.shape == (2, 2048)
        act2 = model.apply(variables, im)
        np.testing.assert_allclose(np.asarray(act), np.asarray(act2))

    def test_param_count_matches_inception_v3(self):
        """Conv/BN parameter count of InceptionV3 feature trunk (~21.8M)."""
        from nerf_from_image_tpu.models.inception import FIDInceptionV3

        model = FIDInceptionV3()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        n = sum(
            np.prod(x.shape) for x in jax.tree.leaves(variables["params"])
        )
        assert 21_000_000 < n < 22_500_000, n


class TestCoordRegressorStep:
    def test_step_runs_and_learns_shapes(self):
        from nerf_from_image_tpu.engine import coord_regressor as cr
        from nerf_from_image_tpu.engine.render import RenderConfig
        from nerf_from_image_tpu.models.generator import Generator
        import nerf_from_image_tpu.models.encoder as enc_mod

        gen = Generator(
            latent_dim=32,
            scene_range=0.55,
            attention_values=0,
            use_sdf=True,
            w_dim=32,
            plane_channels=8,
            synthesis_resolution=16,
            channel_base=256,
            channel_max=32,
        )
        gen_vars = gen.init(jax.random.key(0), method="init_all")

        orig = enc_mod.Segformer

        def tiny_seg(out_features, name, **kw):
            return orig(
                out_features=out_features,
                embed_dims=(8, 8, 8, 8),
                num_heads=(1, 1, 1, 1),
                depths=(1, 1, 1, 1),
                decoder_dim=16,
                name=name,
            )

        enc_mod.Segformer = tiny_seg
        try:
            encoder = enc_mod.BootstrapEncoder(latent_dim=32)
            config = cr.CoordRegressorConfig(batch_size=2, latent_dim=32)
            render_config = RenderConfig(
                resolution=16,
                depth_samples_per_ray=4,
                fine_sampling=False,
                scene_range=0.55,
                white_background=True,
            )
            x = jnp.zeros((1, 16, 16, 3))
            params = encoder.init(jax.random.key(1), x)["params"]
            tx = cr.make_optimizer(config)
            state = cr.CoordTrainState(
                params, tx.init(params), jnp.zeros((), jnp.int32)
            )

            rng = np.random.default_rng(0)
            mats = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
            mats[:, 2, 3] = 2.5
            batch = {
                "pose": jnp.asarray(mats),
                "focal": jnp.ones((2,)) * 1.2,
            }
            state2, losses = jax.jit(
                lambda s, b, k: cr.coord_train_step(
                    config, render_config, gen, gen_vars, encoder, s, b, k
                )
            )(state, batch, jax.random.key(2))
            for k in ("loss", "loss_coords", "loss_mask", "loss_latent"):
                assert np.isfinite(float(losses[k])), k
            assert int(state2.iteration) == 1
            del rng
        finally:
            enc_mod.Segformer = orig

    def test_step_class_conditional(self):
        # Class-conditional generators condition the EMA mapping on sampled
        # labels during encoder distillation (reference: run.py:1634-1638).
        from nerf_from_image_tpu.engine import coord_regressor as cr
        from nerf_from_image_tpu.engine.render import RenderConfig
        from nerf_from_image_tpu.models.generator import Generator
        import nerf_from_image_tpu.models.encoder as enc_mod

        gen = Generator(
            latent_dim=32,
            scene_range=0.55,
            attention_values=0,
            use_sdf=True,
            w_dim=32,
            plane_channels=8,
            synthesis_resolution=16,
            channel_base=256,
            channel_max=32,
            num_classes=3,
        )
        gen_vars = gen.init(jax.random.key(0), method="init_all")
        orig = enc_mod.Segformer

        def tiny_seg(out_features, name, **kw):
            return orig(
                out_features=out_features,
                embed_dims=(8, 8, 8, 8),
                num_heads=(1, 1, 1, 1),
                depths=(1, 1, 1, 1),
                decoder_dim=16,
                name=name,
            )

        enc_mod.Segformer = tiny_seg
        try:
            encoder = enc_mod.BootstrapEncoder(latent_dim=32)
            config = cr.CoordRegressorConfig(batch_size=2, latent_dim=32)
            render_config = RenderConfig(
                resolution=16,
                depth_samples_per_ray=4,
                fine_sampling=False,
                scene_range=0.55,
                white_background=True,
            )
            x = jnp.zeros((1, 16, 16, 3))
            params = encoder.init(jax.random.key(1), x)["params"]
            tx = cr.make_optimizer(config)
            state = cr.CoordTrainState(
                params, tx.init(params), jnp.zeros((), jnp.int32)
            )
            mats = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
            mats[:, 2, 3] = 2.5
            batch = {
                "pose": jnp.asarray(mats),
                "focal": jnp.ones((2,)) * 1.2,
                "classes": jnp.asarray([0, 2], jnp.int32),
            }
            _, losses = jax.jit(
                lambda s, b, k: cr.coord_train_step(
                    config, render_config, gen, gen_vars, encoder, s, b, k
                )
            )(state, batch, jax.random.key(2))
            assert np.isfinite(float(losses["loss"]))
        finally:
            enc_mod.Segformer = orig

    def test_lr_schedule_drops(self):
        from nerf_from_image_tpu.engine import coord_regressor as cr

        config = cr.CoordRegressorConfig()
        sched_early = float(
            jnp.where(
                jnp.asarray(0) < config.lr_drop_at, config.lr, config.lr / 10
            )
        )
        sched_late = float(
            jnp.where(
                jnp.asarray(config.lr_drop_at) < config.lr_drop_at,
                config.lr,
                config.lr / 10,
            )
        )
        np.testing.assert_allclose(sched_early, config.lr, rtol=1e-6)
        np.testing.assert_allclose(sched_late, config.lr / 10, rtol=1e-6)


class TestDiscriminatorGolden:
    """Golden tests vs the PyTorch reference with transferred weights
    (reference: models/stylegan.py:493-676, models/discriminator.py:21-80).
    Same technique as test_encoder_golden.py: randomly-initialized
    reference modules, weights spliced into the flax tree, logits
    asserted allclose."""

    @staticmethod
    def _torch_nchw(x):
        import torch

        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    def test_backbone_unconditional(self):
        from tests.conftest import import_reference_module, reference_available

        if not reference_available():
            pytest.skip("reference checkout not available")
        torch = pytest.importorskip("torch")
        ref_sg = import_reference_module("models.stylegan")
        from nerf_from_image_tpu.models.stylegan import DiscriminatorBackbone
        from nerf_from_image_tpu.utils import torch_interop

        torch.manual_seed(0)
        tD = ref_sg.DiscriminatorBackbone(
            c_dim=0, img_resolution=32, img_channels=3,
            channel_base=1024, channel_max=64,
        )
        tD.eval()
        jD = DiscriminatorBackbone(
            c_dim=0, img_resolution=32, img_channels=3,
            channel_base=1024, channel_max=64,
        )
        x = (
            np.random.default_rng(0)
            .random((4, 32, 32, 3))
            .astype(np.float32)
            * 2
            - 1
        )
        variables = jD.init(jax.random.key(0), jnp.asarray(x))
        sd = torch_interop.torch_module_state_to_numpy(tD)
        variables = jax.tree.map(
            jnp.asarray,
            torch_interop.state_dict_to_variables(dict(variables), sd),
        )
        with torch.no_grad():
            ref = tD(self._torch_nchw(x)).numpy()
        got = np.asarray(jD.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)

    def test_full_discriminator_pose_conditioned(self):
        from tests.conftest import import_reference_module, reference_available

        if not reference_available():
            pytest.skip("reference checkout not available")
        torch = pytest.importorskip("torch")
        ref_disc = import_reference_module("models.discriminator")
        from nerf_from_image_tpu.models.discriminator import Discriminator
        from nerf_from_image_tpu.utils import torch_interop

        torch.manual_seed(1)
        tD = ref_disc.Discriminator(
            resolution=32, nc=4,
            dataset_config={"camera_flipped": False},
            conditional_pose=True,
        )
        tD.eval()
        jD = Discriminator(
            resolution=32, nc=4, camera_flipped=False, conditional_pose=True
        )

        rng = np.random.default_rng(2)
        x = rng.random((4, 32, 32, 4)).astype(np.float32) * 2 - 1
        mats = []
        for _ in range(4):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            m = np.eye(4)
            m[:3, :3] = q
            m[:3, 3] = q @ np.array([0.0, 0.0, 2.5])
            mats.append(m)
        pose = np.stack(mats).astype(np.float32)
        focal = (1.0 + rng.random(4)).astype(np.float32)

        variables = jD.init(
            jax.random.key(0), jnp.asarray(x), pose=jnp.asarray(pose),
            focal=jnp.asarray(focal),
        )
        sd = torch_interop.torch_module_state_to_numpy(tD)
        variables = jax.tree.map(
            jnp.asarray,
            torch_interop.state_dict_to_variables(dict(variables), sd),
        )
        with torch.no_grad():
            ref = tD(
                self._torch_nchw(x), 0,
                pose=torch.from_numpy(pose),
                focal=torch.from_numpy(focal),
            ).numpy()
        got = np.asarray(
            jD.apply(
                variables, jnp.asarray(x), pose=jnp.asarray(pose),
                focal=jnp.asarray(focal),
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)
