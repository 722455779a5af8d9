"""Driving data-layer unit tests: box geometry vs reference, crop pipeline
invariants, known-K PnP."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_module, reference_available


class TestBoxGeometry:
    @pytest.mark.skipif(not reference_available(), reason="no reference")
    def test_pts_in_box_matches_reference(self):
        ref_utils = import_reference_module("lib.utils")
        from nerf_from_image_tpu.data import driving

        rng = np.random.default_rng(0)
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        pose = np.concatenate([q, rng.standard_normal((3, 1))], axis=1)
        wlh = np.abs(rng.standard_normal(3)) + 0.5
        corners_ref = ref_utils.corners_of_box(pose, wlh, is_kitti=False)
        corners_got = driving.corners_of_box(pose, wlh, is_kitti=False)
        np.testing.assert_allclose(corners_got, corners_ref)
        corners_ref_k = ref_utils.corners_of_box(pose, wlh, is_kitti=True)
        corners_got_k = driving.corners_of_box(pose, wlh, is_kitti=True)
        np.testing.assert_allclose(corners_got_k, corners_ref_k)

        pts = rng.standard_normal((3, 500)) * 2
        ref_in = ref_utils.pts_in_box_3d(pts, corners_ref, 0.9)
        got_in = driving.pts_in_box_3d(pts, corners_got, 0.9)
        np.testing.assert_array_equal(got_in, ref_in)

    def test_mask_occ(self):
        from nerf_from_image_tpu.data import driving

        m1 = np.zeros((4, 4), np.uint8)
        m1[1:3, 1:3] = 1
        m2 = np.zeros((4, 4), np.uint8)
        m2[0:2, 0:2] = 1
        occ = driving.get_mask_occ_from_ins([m1, m2], 0)
        assert occ[1, 1] == 1  # target
        assert occ[0, 0] == 0  # occluder (other instance)
        assert occ[3, 3] == -1  # background

    def test_kitti2nusc_pose(self):
        from nerf_from_image_tpu.data import driving

        pose = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
        out = driving.obj_pose_kitti2nusc(pose.astype(np.float32), 1.0)
        np.testing.assert_allclose(out[1, 3], 1.5)
        # x-front stays, y-down -> z, z-left -> -y under R_x.
        np.testing.assert_allclose(
            out[:, :3],
            np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32),
        )


class TestCropPipeline:
    def test_crop_for_inversion_shapes(self):
        from nerf_from_image_tpu.data import driving

        rng = np.random.default_rng(1)
        img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
        mask_occ = np.zeros((60, 80), np.int32) - 1
        mask_occ[20:40, 30:55] = 1
        depth = np.zeros((60, 80), np.float32)
        depth[25, 35] = 7.5
        K = np.array([[500.0, 0, 40], [0, 500.0, 30], [0, 0, 1]])
        out = driving.crop_for_inversion(
            img, mask_occ, depth, [30, 20, 55, 40], K, 32, white_bkgd=True
        )
        assert out["img"].shape == (32, 32, 3)
        assert out["mask"].shape == (32, 32)
        assert out["depth"].shape == (32, 32)
        assert out["K"].shape == (3, 3)
        # White background outside the mask.
        bg = out["img"][out["mask"] == 0]
        np.testing.assert_allclose(bg, 1.0, atol=1e-5)
        # Depth survives (nearest resize).
        assert (out["depth"] > 0).any()

    def test_nusc_quat_vs_scipy(self):
        from scipy.spatial.transform import Rotation

        from nerf_from_image_tpu.data.nusc_lite import quat_to_rot

        rng = np.random.default_rng(2)
        for _ in range(5):
            q = rng.standard_normal(4)
            q /= np.linalg.norm(q)
            want = Rotation.from_quat(
                [q[1], q[2], q[3], q[0]]
            ).as_matrix()  # scipy xyzw
            got = quat_to_rot(q)
            np.testing.assert_allclose(got, want, atol=1e-10)


class TestKnownKPnP:
    def test_recovers_pose(self):
        from nerf_from_image_tpu.pose import pnp

        rng = np.random.default_rng(3)
        B, H, W = 2, 24, 24
        fx, fy, cx, cy = 1.3, 1.3, 0.02, -0.01
        K = np.tile(
            np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32),
            (B, 1, 1),
        )
        coords = np.zeros((B, H, W, 3), np.float32)
        masks = np.zeros((B, H, W), np.float32)
        w2c_gt = []
        for b in range(B):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            t = np.array([0.05, -0.02, 3.0])
            for y in range(H):
                for x in range(W):
                    u = x / W - 0.5
                    v = y / H - 0.5
                    z = 2.5 + rng.random()
                    cam = np.array(
                        [(u - cx) / fx * z, (v - cy) / fy * z, z]
                    )
                    coords[b, y, x] = (cam - t) @ q
                    masks[b, y, x] = 1.0
            m = np.eye(4)
            m[:3, :3] = q
            m[:3, 3] = t
            w2c_gt.append(np.diag([1.0, -1, -1, 1]) @ m)

        w2c, err = pnp.compute_pose_pnp_known_k(
            jnp.asarray(coords), jnp.asarray(masks), jnp.asarray(K)
        )
        np.testing.assert_allclose(
            np.asarray(w2c), np.stack(w2c_gt), rtol=1e-3, atol=2e-3
        )
        assert np.asarray(err).max() < 1e-3


class TestDrivingDemoExport:
    """Per-object demo composites (reference: eval_nusc_persp.py:553-802)."""

    def test_depth_panel(self):
        import eval_driving

        depth = np.full((8, 8), 10.0)
        depth[2:6, 2:6] = 12.0
        mask = np.zeros((8, 8))
        mask[2:6, 2:6] = 1.0
        panel = eval_driving.depth_panel(depth, mask, white_background=True)
        assert panel.shape == (8, 8, 3)
        # Background is white (1.0); fg is centered on its median (0.0).
        assert panel[0, 0, 0] == 1.0
        assert abs(panel[3, 3, 0]) < 1e-6

    def test_export_composite(self, tmp_path, monkeypatch):
        import types

        import eval_driving
        from nerf_from_image_tpu.data.configs import get_dataset_config
        from nerf_from_image_tpu.ops.compositing import CompositeOutput

        monkeypatch.chdir(tmp_path)
        args = types.SimpleNamespace(dataset="nusc")
        config_ds = get_dataset_config("p3d_car")
        rng = np.random.RandomState(0)
        res = 16
        out = CompositeOutput(
            rgb=rng.rand(1, res, res, 3).astype(np.float32) * 2 - 1,
            depth=np.full((1, res, res), 5.0, np.float32),
            mask=np.ones((1, res, res), np.float32),
            normals=None, semantics=None,
        )
        metrics = {
            "psnr": np.asarray([20.0]), "depth_error": np.asarray([0.3]),
            "rot_error": np.asarray([5.0]), "trans_error": np.asarray([0.2]),
        }
        sample = {"img": rng.rand(res, res, 4).astype(np.float32) * 2 - 1}
        coords = rng.rand(1, res, res, 3).astype(np.float32)
        mask_pred = np.ones((1, res, res), np.float32)
        eval_driving.export_driving_demo(
            args, config_ds, 3, 50, sample, coords, mask_pred, metrics,
            out, out,
        )
        import imageio.v2 as imageio

        path = tmp_path / "outputs" / "eval_nusc" / "demo_obj3_50it.png"
        assert path.exists()
        grid = imageio.imread(str(path))
        # input | coords | recon | depth | cross recon | cross depth
        assert grid.shape[:2] == (res, res * 6)
