"""Inversion engine tests: loss modes, constraint projection, and actual
convergence of the jit-compiled lax.scan optimization loop (reference:
run.py:1743-2405, 2202-2310)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_gan_engine import tiny_models


def _tiny_setup(optimize_pose=True, loss="mse", is_ortho=False, res=24,
                optimize_focal=True):
    from nerf_from_image_tpu.engine import inversion as inv_mod
    from nerf_from_image_tpu.engine.render import RenderConfig
    from nerf_from_image_tpu.models.lpips import LPIPS

    model, _ = tiny_models()
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    config = inv_mod.InversionConfig(
        steps=12,
        loss=loss,
        optimize_pose=optimize_pose,
        optimize_focal=optimize_focal,
        is_ortho=is_ortho,
        num_augmentations=2,
    )
    render_config = RenderConfig(
        resolution=res,
        depth_samples_per_ray=12,
        fine_sampling=True,
        scene_range=0.55,
        white_background=True,
    )
    lpips_model = LPIPS()
    lpips_vars = lpips_model.init(
        jax.random.key(1), jnp.zeros((1, res, res, 3)),
        jnp.zeros((1, res, res, 3)),
    )
    return inv_mod, model, variables, config, render_config, lpips_model, \
        lpips_vars


def _pose(dist=1.5, angle=0.0):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    m[:3, 3] = m[:3, :3] @ np.array([0, 0, dist], np.float32)
    return jnp.asarray(m)[None]


class TestProjection:
    def test_constraints_after_step(self):
        from nerf_from_image_tpu.engine.inversion import (
            PoseParams,
            _project,
            build_camera,
        )

        params = PoseParams(
            z0=jnp.asarray([9.0]),
            t2=jnp.asarray([[0.3, -0.2]]),
            s=jnp.asarray([-1.7]),
            q=jnp.asarray([[2.0, 0.0, 0.0, 0.0]]),
        )
        proj = _project(params)
        # Reference re-projections (run.py:2307-2310): z0 clamped to
        # [-4, 4], s made positive, quaternion renormalized.
        assert float(proj.z0[0]) == 4.0
        np.testing.assert_allclose(float(proj.s[0]), 1.7, rtol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(proj.q)), 1.0, rtol=1e-6
        )
        cam, focal = build_camera(proj, camera_flipped=False)
        assert cam.shape == (1, 4, 4) and focal.shape == (1,)

    def test_roundtrip_through_params(self):
        from nerf_from_image_tpu.engine.inversion import (
            build_camera,
            pose_params_from_matrix,
        )

        pose = _pose(dist=1.5, angle=0.4)
        focal = jnp.asarray([1.3])
        params = pose_params_from_matrix(pose, focal, camera_flipped=False)
        cam, f = build_camera(params, camera_flipped=False)
        np.testing.assert_allclose(np.asarray(cam), np.asarray(pose),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f), np.asarray(focal),
                                   rtol=1e-5)


class TestReconstructionLoss:
    def test_l1_and_mse_values(self):
        from nerf_from_image_tpu.engine import inversion as inv_mod

        rng = np.random.RandomState(0)
        pred = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
        tgt = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
        cfg_l1 = inv_mod.InversionConfig(loss="l1")
        # The reference multiplies the mean by B (run.py:2249-2252).
        got = inv_mod.reconstruction_loss(
            cfg_l1, None, None, pred, tgt, None, None
        )
        np.testing.assert_allclose(
            float(got), float(np.mean(np.abs(pred - tgt))) * 2, rtol=1e-6
        )
        cfg_mse = inv_mod.InversionConfig(loss="mse")
        got = inv_mod.reconstruction_loss(
            cfg_mse, None, None, pred, tgt, None, None
        )
        np.testing.assert_allclose(
            float(got), float(np.mean(np.square(pred - tgt))) * 2, rtol=1e-6
        )

    def test_vgg_nocrop_uses_cached_features(self):
        from nerf_from_image_tpu.engine import inversion as inv_mod
        from nerf_from_image_tpu.models.lpips import LPIPS

        rng = np.random.RandomState(1)
        pred = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
        tgt = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
        lpips_model = LPIPS()
        lpips_vars = lpips_model.init(jax.random.key(0), pred, tgt)
        feats = lpips_model.apply(lpips_vars, tgt, method="features")
        cfg = inv_mod.InversionConfig(loss="vgg_nocrop")
        got = inv_mod.reconstruction_loss(
            cfg, lpips_model, lpips_vars, pred, tgt, feats, None
        )
        direct = lpips_model.apply(lpips_vars, pred, tgt)
        np.testing.assert_allclose(float(got), float(np.mean(direct)),
                                   rtol=1e-5)


class TestInversionLoop:
    def test_converges_and_projects(self):
        (inv_mod, model, variables, config, render_config, lpips_model,
         lpips_vars) = _tiny_setup(loss="mse")
        from nerf_from_image_tpu.engine.render import render

        # Ground-truth target render.
        z_true = jax.random.normal(jax.random.key(7), (1, 64))
        pose_true = _pose(dist=1.5, angle=0.3)
        focal_true = jnp.asarray([1.2])
        out, aux = render(
            render_config, model, variables, pose_true, focal_true, z_true
        )
        target = jnp.clip(out.rgb, -1, 1)
        ws_true = aux["ws"]

        # Perturbed init.
        z0 = (ws_true + 0.3 * jax.random.normal(
            jax.random.key(8), ws_true.shape)) / config.lr_gain_z
        pose_init = _pose(dist=1.6, angle=0.45)
        params = inv_mod.pose_params_from_matrix(
            pose_init, jnp.asarray([1.1]), camera_flipped=False
        )
        invert = jax.jit(
            inv_mod.make_invert_fn(
                config, render_config, model, variables, lpips_model,
                lpips_vars,
            ),
            static_argnames=("n_steps",),
        )
        z_f, pose_f, losses = invert(
            z0, params, target, jax.random.key(9), n_steps=12
        )
        losses = np.asarray(losses)
        assert losses.shape == (12,)
        assert losses[-1] < losses[0] * 0.9, losses
        # Projection invariants hold on the returned pose.
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pose_f.q)), 1.0, rtol=1e-5
        )
        assert float(pose_f.s[0, 0] if pose_f.s.ndim > 1 else
                     pose_f.s[0]) > 0

    def test_no_optimize_pose_keeps_pose(self):
        (inv_mod, model, variables, config, render_config, lpips_model,
         lpips_vars) = _tiny_setup(optimize_pose=False, loss="l1", res=16)
        target = jnp.zeros((1, 16, 16, 3))
        z0 = jax.random.normal(jax.random.key(0), (1, 1, 64)) / 5.0
        params = inv_mod.pose_params_from_matrix(
            _pose(), jnp.asarray([1.2]), camera_flipped=False
        )
        invert = jax.jit(
            inv_mod.make_invert_fn(
                config, render_config, model, variables, lpips_model,
                lpips_vars,
            ),
            static_argnames=("n_steps",),
        )
        z_f, pose_f, losses = invert(
            z0, params, target, jax.random.key(1), n_steps=3
        )
        np.testing.assert_array_equal(np.asarray(pose_f.q),
                                      np.asarray(params.q))
        np.testing.assert_array_equal(np.asarray(pose_f.t2),
                                      np.asarray(params.t2))
        assert not np.array_equal(np.asarray(z_f), np.asarray(z0))

    def test_optimize_focal_false_keeps_z0(self):
        # Driving evals hold the known focal fixed while still optimizing
        # R/s/t (reference: eval_nusc_persp.py:1219-1221 excludes z0 from
        # param_list).
        (inv_mod, model, variables, config, render_config, lpips_model,
         lpips_vars) = _tiny_setup(loss="l1", res=16, optimize_focal=False)
        target = jnp.zeros((1, 16, 16, 3))
        z0 = jax.random.normal(jax.random.key(0), (1, 1, 64)) / 5.0
        params = inv_mod.pose_params_from_matrix(
            _pose(), jnp.asarray([1.2]), camera_flipped=False
        )
        invert = jax.jit(
            inv_mod.make_invert_fn(
                config, render_config, model, variables, lpips_model,
                lpips_vars,
            ),
            static_argnames=("n_steps",),
        )
        z_f, pose_f, losses = invert(
            z0, params, target, jax.random.key(1), n_steps=3
        )
        np.testing.assert_array_equal(np.asarray(pose_f.z0),
                                      np.asarray(params.z0))
        # Pose is still optimized and the latent moves.
        assert not np.array_equal(np.asarray(pose_f.t2),
                                  np.asarray(params.t2))
        assert not np.array_equal(np.asarray(z_f), np.asarray(z0))

    def test_ortho_camera_path(self):
        (inv_mod, model, variables, config, render_config, lpips_model,
         lpips_vars) = _tiny_setup(loss="l1", is_ortho=True, res=16)
        pose = _pose(dist=1.5)
        params = inv_mod.pose_params_from_matrix(
            pose, None, camera_flipped=False
        )
        assert params.z0 is None
        target = jnp.zeros((1, 16, 16, 3))
        z0 = jax.random.normal(jax.random.key(0), (1, 1, 64)) / 5.0
        invert = jax.jit(
            inv_mod.make_invert_fn(
                config, render_config, model, variables, lpips_model,
                lpips_vars,
            ),
            static_argnames=("n_steps",),
        )
        z_f, pose_f, losses = invert(
            z0, params, target, jax.random.key(1), n_steps=2
        )
        assert pose_f.z0 is None
        assert np.isfinite(np.asarray(losses)).all()


class TestInvertDriverEndToEnd:
    """invert.main() on the synthetic dataset over the 8-device CPU mesh:
    batch = max(1, batch_size//4) * n_devices, batch leaves sharded over
    the mesh 'data' axis, report written and resumable."""

    def test_end_to_end_sharded(self, tmp_path, monkeypatch):
        import sys

        import invert as invert_driver
        import nerf_from_image_tpu.models.generator as gen_mod

        orig_gen = gen_mod.Generator

        def tiny_generator(**kw):
            kw.update(w_dim=64, plane_channels=8, synthesis_resolution=16,
                      channel_base=512, channel_max=64)
            return orig_gen(**kw)

        monkeypatch.setattr(gen_mod, "Generator", tiny_generator)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "invert.py", "--dataset", "synthetic", "--batch_size", "4",
            "--resolution", "16", "--inv_steps", "2", "--max_images", "16",
            "--latent_dim", "64", "--query_chunk", "0",
            "--root_path", str(tmp_path),
        ])
        invert_driver.main()

        report = tmp_path / "reports" / "inv_synthetic" / "report.npz"
        assert report.exists()
        data = np.load(str(report))
        # bs = max(1, 4//4) * 8 devices = 8; 16 images -> 2 batches, all
        # real rows accumulated.
        for step in (0, 2):
            assert f"step{step}/psnr" in data.files
            assert len(data[f"step{step}/psnr"]) == 16
        txt = tmp_path / "reports" / "inv_synthetic" / "report.txt"
        assert txt.exists()
