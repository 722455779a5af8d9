"""Driving data-layer unit tests: box geometry vs reference, crop pipeline
invariants, known-K PnP."""

import os

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


class TestReprojectDepth:
    def test_identity_transform_is_exact(self):
        """A grid-aligned depth map reprojected through the identity must
        land back on the SAME pixels: the forward ray grid samples at
        col/S - cx, whose exact inverse is an integer, so any systematic
        floor()-shift would displace every point by one pixel (advisor
        round-3 finding)."""
        import eval_driving

        S = 16
        rng = np.random.default_rng(3)
        depth = np.zeros((S, S))
        r = rng.integers(0, S, 20)
        c = rng.integers(0, S, 20)
        depth[r, c] = rng.uniform(2.0, 8.0, 20)
        K = np.array(
            [[1.4, 0.0, 0.03], [0.0, 1.4, -0.02], [0.0, 0.0, 1.0]]
        )
        out = eval_driving.reproject_depth(depth, K, np.eye(4))
        np.testing.assert_allclose(out, depth, rtol=1e-9, atol=1e-9)


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


def _build_nusc_fixture(root):
    """Minimal on-disk nuScenes-format tree: one instance annotated in two
    camera views (cross-view path), LiDAR points on the object, Mask-RCNN
    style instance masks, and the valid-sample index JSON."""
    import json

    import imageio.v2 as imageio

    version = "v1.0-mini"
    os.makedirs(os.path.join(root, version))
    os.makedirs(os.path.join(root, "samples", "CAM_FRONT"))
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"))
    os.makedirs(os.path.join(root, "pred_instance", "CAM_FRONT"))

    K = [[50.0, 0.0, 32.0], [0.0, 50.0, 32.0], [0.0, 0.0, 1.0]]
    ident_q = [1.0, 0.0, 0.0, 0.0]
    tables = {
        "sensor": [
            {"token": "sen_cam", "channel": "CAM_FRONT",
             "modality": "camera"},
            {"token": "sen_lid", "channel": "LIDAR_TOP",
             "modality": "lidar"},
        ],
        "calibrated_sensor": [
            {"token": "cs_cam", "sensor_token": "sen_cam",
             "translation": [0, 0, 0], "rotation": ident_q,
             "camera_intrinsic": K},
            {"token": "cs_lid", "sensor_token": "sen_lid",
             "translation": [0, 0, 0], "rotation": ident_q,
             "camera_intrinsic": []},
        ],
        "ego_pose": [
            {"token": "ep1", "translation": [0, 0, 0],
             "rotation": ident_q},
            {"token": "ep2", "translation": [0.5, 0, 0],
             "rotation": ident_q},
        ],
        "sample_data": [],
        "sample": [],
        "sample_annotation": [],
        "instance": [{"token": "ins1", "category_token": "cat1"}],
        "category": [{"token": "cat1", "name": "vehicle.car"}],
    }
    rng = np.random.RandomState(0)
    for v, ep in ((1, "ep1"), (2, "ep2")):
        img_name = f"samples/CAM_FRONT/view{v}.png"
        lid_name = f"samples/LIDAR_TOP/view{v}.bin"
        tables["sample_data"] += [
            {"token": f"sd_cam{v}", "sample_token": f"s{v}",
             "calibrated_sensor_token": "cs_cam", "ego_pose_token": ep,
             "filename": img_name},
            {"token": f"sd_lid{v}", "sample_token": f"s{v}",
             "calibrated_sensor_token": "cs_lid", "ego_pose_token": ep,
             "filename": lid_name},
        ]
        tables["sample"].append(
            {"token": f"s{v}",
             "data": {"CAM_FRONT": f"sd_cam{v}", "LIDAR_TOP": f"sd_lid{v}"}}
        )
        tables["sample_annotation"].append(
            {"token": f"a{v}", "sample_token": f"s{v}",
             "instance_token": "ins1", "translation": [0, 0, 4],
             "size": [2.0, 2.0, 2.0], "rotation": ident_q}
        )
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(root, img_name), img)
        # LiDAR points inside the box (global frame = sensor frame here).
        pts = np.zeros((40, 5), np.float32)
        pts[:, 0] = rng.uniform(-0.8, 0.8, 40)  # x
        pts[:, 1] = rng.uniform(-0.8, 0.0, 40)  # y (top portion)
        pts[:, 2] = rng.uniform(3.2, 4.8, 40)  # z (depth)
        pts.tofile(os.path.join(root, lid_name))
        # Instance mask covering the projected box.
        mask = np.zeros((64, 64), np.uint8)
        mask[20:45, 18:46] = 255
        stem = f"view{v}"
        imageio.imwrite(
            os.path.join(root, "pred_instance", "CAM_FRONT",
                         f"{stem}_0.png"), mask
        )
        with open(os.path.join(root, "pred_instance", "CAM_FRONT",
                               f"{stem}.json"), "w") as f:
            json.dump({"boxes": [[18, 20, 46, 45]], "classes": [2],
                       "scores": [0.95]}, f)

    for name, rows in tables.items():
        with open(os.path.join(root, version, f"{name}.json"), "w") as f:
            json.dump(rows, f)

    index = {
        "all_valid_samples": [["a1", "CAM_FRONT"], ["a2", "CAM_FRONT"]],
        "instoken_per_ann": {"a1": "ins1", "a2": "ins1"},
        "anntokens_per_ins": {
            "ins1": [["a1", "CAM_FRONT"], ["a2", "CAM_FRONT"]]
        },
        "sample_attr": {
            "a1": {"CAM_FRONT": {"seg_id": 0}},
            "a2": {"CAM_FRONT": {"seg_id": 0}},
        },
    }
    index_path = os.path.join(root, version, "index.json")
    with open(index_path, "w") as f:
        json.dump(index, f)
    return index_path


class TestDemoDrivingDriver:
    """End-to-end demo_driving.main() on the synthetic nuScenes fixture:
    named-frame lookup through the devkit 'channel' shortcut (derived via
    the calibrated_sensor -> sensor join), Mask-RCNN instance filtering
    (COCO integer 'classes' schema), per-car crop + PnP + inversion, and
    the side-by-side composite export (reference demo_nusc.py:666-700)."""

    def test_end_to_end(self, tmp_path, monkeypatch):
        import sys

        import demo_driving
        import nerf_from_image_tpu.models.generator as gen_mod

        root = str(tmp_path / "nusc")
        os.makedirs(root)
        _build_nusc_fixture(root)

        orig_gen = gen_mod.Generator

        def tiny_generator(**kw):
            kw.update(w_dim=64, plane_channels=8, synthesis_resolution=16,
                      channel_base=512, channel_max=64)
            return orig_gen(**kw)

        monkeypatch.setattr(gen_mod, "Generator", tiny_generator)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "demo_driving.py", "--dataset", "nusc",
            "--nusc_data_dir", root,
            "--inv_manual_input_path", "view1.png",
            "--resolution", "16", "--inv_steps", "2",
            "--latent_dim", "64", "--query_chunk", "0",
        ])
        demo_driving.main()
        out = list((tmp_path / "outputs").rglob("*.png"))
        assert out, "demo composite not written"


class TestDrivingEvalPipeline:
    """End-to-end eval_driving.main() on the synthetic nuScenes fixture:
    reader -> box/LiDAR math -> crop -> inversion -> metrics (incl.
    cross-view) -> demo composite -> report."""

    def test_end_to_end(self, tmp_path, monkeypatch):
        import sys

        import eval_driving
        import nerf_from_image_tpu.models.generator as gen_mod
        from nerf_from_image_tpu.data.nusc_lite import NuScenesDrivingDataset

        root = str(tmp_path / "nusc")
        os.makedirs(root)
        index_path = _build_nusc_fixture(root)

        # The driver builds the full-size generator; shrink it for CI.
        orig_gen = gen_mod.Generator

        def tiny_generator(**kw):
            kw.update(w_dim=64, plane_channels=8, synthesis_resolution=16,
                      channel_base=512, channel_max=64)
            return orig_gen(**kw)

        monkeypatch.setattr(gen_mod, "Generator", tiny_generator)
        orig_init = NuScenesDrivingDataset.__init__

        def patched_init(self, *a, **kw):
            kw["index_file"] = index_path
            orig_init(self, *a, **kw)

        monkeypatch.setattr(NuScenesDrivingDataset, "__init__", patched_init)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "eval_driving.py", "--dataset", "nusc",
            "--nusc_data_dir", root, "--resolution", "16",
            "--inv_steps", "2", "--latent_dim", "64",
            "--query_chunk", "0", "--inv_export_demo_sample",
        ])
        eval_driving.main()

        report = tmp_path / "reports" / "eval_nusc" / "report.npz"
        assert report.exists()
        data = np.load(str(report))
        for step in (0, 2):
            assert f"step{step}/psnr" in data.files
            assert f"step{step}/depth_error" in data.files
            assert f"step{step}/psnr_random" in data.files  # cross-view
            assert len(data[f"step{step}/psnr"]) == 2
        # Per-object demo composites at the final step.
        assert (tmp_path / "outputs" / "eval_nusc"
                / "demo_obj0_2it.png").exists()
        assert (tmp_path / "outputs" / "eval_nusc"
                / "demo_obj1_2it.png").exists()

    def test_end_to_end_with_encoder(self, tmp_path, monkeypatch):
        """Encoder + PnP init path: regressed coords/mask/w drive the
        pose estimate and latent init (reference:
        eval_nusc_persp.py:1147-1163)."""
        import sys

        import jax

        import eval_driving
        import nerf_from_image_tpu.models.encoder as enc_mod
        import nerf_from_image_tpu.models.generator as gen_mod
        from nerf_from_image_tpu.data.nusc_lite import NuScenesDrivingDataset
        from nerf_from_image_tpu.engine.coord_regressor import (
            CoordRegressorConfig,
            init_coord_state,
        )
        from nerf_from_image_tpu.utils import checkpoint as ckpt

        root = str(tmp_path / "nusc")
        os.makedirs(root)
        index_path = _build_nusc_fixture(root)

        orig_gen = gen_mod.Generator

        def tiny_generator(**kw):
            kw.update(w_dim=64, plane_channels=8, synthesis_resolution=16,
                      channel_base=512, channel_max=64)
            return orig_gen(**kw)

        orig_enc = enc_mod.BootstrapEncoder

        def tiny_encoder(**kw):
            kw.setdefault("backbone_depths", (1, 1, 1, 1))
            return orig_enc(**kw)

        monkeypatch.setattr(gen_mod, "Generator", tiny_generator)
        monkeypatch.setattr(enc_mod, "BootstrapEncoder", tiny_encoder)
        orig_init = NuScenesDrivingDataset.__init__

        def patched_init(self, *a, **kw):
            kw["index_file"] = index_path
            orig_init(self, *a, **kw)

        monkeypatch.setattr(NuScenesDrivingDataset, "__init__", patched_init)
        monkeypatch.chdir(tmp_path)

        # A "trained" tiny encoder checkpoint in coord-regressor layout.
        enc = tiny_encoder(latent_dim=64)
        state = init_coord_state(
            CoordRegressorConfig(batch_size=1, latent_dim=64), enc,
            jax.random.key(0),
        )
        enc_ckpt = str(tmp_path / "coord_ckpt")
        ckpt.save_checkpoint(enc_ckpt, state)

        monkeypatch.setattr(sys, "argv", [
            "eval_driving.py", "--dataset", "nusc",
            "--nusc_data_dir", root, "--resolution", "16",
            "--inv_steps", "1", "--latent_dim", "64",
            "--query_chunk", "0", "--max_num_samples", "1",
            "--coord_resume_from", enc_ckpt,
        ])
        eval_driving.main()
        report = tmp_path / "reports" / "eval_nusc" / "report.npz"
        data = np.load(str(report))
        assert len(data["step0/psnr"]) == 1
        assert np.isfinite(data["step1/rot_error"]).all()


class TestKittiObjectReaderLayout:
    """Waymo-as-KITTI exports use image/ + label/; KITTI uses image_2/ +
    label_2/ (reference: data/waymo_object.py:54-55 vs
    data/kitti_object.py:54-55)."""

    def test_kitti_vs_waymo_dirs(self, tmp_path):
        import imageio.v2 as imageio

        from nerf_from_image_tpu.data.driving import KittiObjectReader

        line = ("Car 0.0 0 -1.5 0 0 10 10 "
                "1.5 1.6 3.9 1.0 1.5 20.0 -1.2\n")
        for is_waymo, img_dir, lbl_dir in (
            (False, "image_2", "label_2"),
            (True, "image", "label"),
        ):
            root = tmp_path / ("waymo" if is_waymo else "kitti")
            sd = root / "training"
            (sd / img_dir).mkdir(parents=True)
            (sd / lbl_dir).mkdir()
            imageio.imwrite(
                str(sd / img_dir / "000000.png"),
                np.zeros((4, 6, 3), np.uint8),
            )
            (sd / lbl_dir / "000000.txt").write_text(line)
            reader = KittiObjectReader(
                str(root), "training", is_waymo=is_waymo
            )
            assert reader.image(0).shape == (4, 6, 3)
            labels = reader.labels(0)
            assert labels[0].type == "Car" and labels[0].ry == -1.2


class TestDevkit:
    """Devkit geometry/viz closure (reference data/kitti_util.py,
    data/kitti_object.py): projection round-trips, golden comparisons
    against the reference devkit, BEV raster equivalence."""

    CALIB = (
        "P2: 721.5377 0.0 609.5593 44.85728 "
        "0.0 721.5377 172.854 0.2163791 0.0 0.0 1.0 0.002745884\n"
        "R0_rect: 0.9999239 0.00983776 -0.007445048 "
        "-0.0098698 0.9999421 -0.004278459 "
        "0.007402527 0.004351614 0.9999631\n"
        "Tr_velo_to_cam: 0.007533745 -0.9999714 -0.000616602 -0.004069766 "
        "0.01480249 0.0007280733 -0.9998902 -0.07631618 "
        "0.9998621 0.00752379 0.0148556 -0.2717806\n"
    )

    def _calib(self, tmp_path):
        from nerf_from_image_tpu.data.driving import KittiCalibration

        p = tmp_path / "000000.txt"
        p.write_text(self.CALIB)
        return KittiCalibration(str(p)), str(p)

    def test_projection_roundtrips(self, tmp_path):
        calib, _ = self._calib(tmp_path)
        rng = np.random.default_rng(0)
        velo = rng.uniform([2, -10, -2], [60, 10, 1], (200, 3))
        # velo<->ref round trips invert a calib-file rotation that is only
        # orthogonal to the file's printed precision (R R^T deviates from
        # I by ~5e-5 for these KITTI-style values), so
        # exactness is bounded by that — identical to the reference devkit,
        # whose inverse_rigid_trans makes the same orthogonality assumption.
        rect = calib.project_velo_to_rect(velo)
        np.testing.assert_allclose(
            calib.project_rect_to_velo(rect), velo, atol=5e-3
        )
        ref = calib.project_velo_to_ref(velo)
        np.testing.assert_allclose(
            calib.project_ref_to_velo(ref), velo, atol=5e-3
        )
        # rect<->ref uses an exact matrix inverse: machine precision.
        np.testing.assert_allclose(
            calib.project_ref_to_rect(calib.project_rect_to_ref(rect)),
            rect, atol=1e-9,
        )
        uv = calib.project_rect_to_image(rect)
        uvd = np.concatenate([uv, rect[:, 2:3]], axis=1)
        # image->rect ignores the P2 third-row offset (P23=0.0027 here) —
        # the same small-baseline approximation the reference devkit makes
        # (kitti_util.py:288-300); the golden test below confirms exact
        # agreement with the reference's own back-projection.
        np.testing.assert_allclose(
            calib.project_image_to_rect(uvd), rect, atol=2e-2
        )
        np.testing.assert_allclose(
            calib.project_image_to_velo(uvd), velo, atol=2e-2
        )

    def test_calibration_golden_vs_reference(self, tmp_path):
        from tests.conftest import import_reference_module, reference_available

        if not reference_available():
            pytest.skip("reference checkout not available")
        ref_util = import_reference_module("data.kitti_util")
        calib, path = self._calib(tmp_path)
        ref_calib = ref_util.Calibration(path)
        rng = np.random.default_rng(1)
        velo = rng.uniform([2, -10, -2], [60, 10, 1], (64, 3))
        for mine, theirs in (
            (calib.project_velo_to_rect, ref_calib.project_velo_to_rect),
            (calib.project_velo_to_image, ref_calib.project_velo_to_image),
            (calib.project_velo_to_4p, ref_calib.project_velo_to_4p),
        ):
            np.testing.assert_allclose(mine(velo), theirs(velo), atol=1e-9)
        rect = calib.project_velo_to_rect(velo)
        np.testing.assert_allclose(
            calib.project_rect_to_velo(rect),
            ref_calib.project_rect_to_velo(rect), atol=1e-9,
        )
        uvd = rng.uniform([0, 0, 2], [1200, 370, 60], (64, 3))
        np.testing.assert_allclose(
            calib.project_image_to_velo(uvd),
            ref_calib.project_image_to_velo(uvd), atol=1e-9,
        )
        depth = rng.uniform(2, 60, (8, 12))
        np.testing.assert_allclose(
            calib.project_depth_to_velo(depth, constraint_box=True),
            ref_calib.project_depth_to_velo(depth, constraint_box=True),
            atol=1e-9,
        )

    def test_box3d_golden_vs_reference(self, tmp_path):
        from tests.conftest import import_reference_module, reference_available

        if not reference_available():
            pytest.skip("reference checkout not available")
        ref_util = import_reference_module("data.kitti_util")
        from nerf_from_image_tpu.data import devkit
        from nerf_from_image_tpu.data.driving import KittiLabel

        calib, _ = self._calib(tmp_path)
        line = ("Car 0.1 1 -1.57 100 150 300 250 "
                "1.5 1.6 3.9 1.0 1.5 20.0 -1.2")
        mine = KittiLabel.parse(line)
        theirs = ref_util.Object3d(line)
        c2d, c3d = devkit.compute_box_3d(mine, calib.P)
        rc2d, rc3d = ref_util.compute_box_3d(theirs, calib.P)
        np.testing.assert_allclose(c3d, rc3d, atol=1e-9)
        np.testing.assert_allclose(c2d, rc2d, atol=1e-9)
        o2d, o3d = devkit.compute_orientation_3d(mine, calib.P)
        ro2d, ro3d = ref_util.compute_orientation_3d(theirs, calib.P)
        np.testing.assert_allclose(o3d, ro3d, atol=1e-9)
        np.testing.assert_allclose(o2d, ro2d, atol=1e-9)
        # Behind-camera handling: corners_2d becomes None.
        behind = KittiLabel.parse(
            "Car 0.0 0 0.0 0 0 10 10 1.5 1.6 3.9 0.0 1.0 -5.0 0.0"
        )
        c2d_b, _ = devkit.compute_box_3d(behind, calib.P)
        assert c2d_b is None

    def test_lidar_to_top_golden_vs_reference(self):
        from tests.conftest import import_reference_module, reference_available

        if not reference_available():
            pytest.skip("reference checkout not available")
        ref_util = import_reference_module("data.kitti_util")
        from nerf_from_image_tpu.data import devkit

        rng = np.random.default_rng(2)
        lidar = np.concatenate(
            [
                rng.uniform([0.5, -29, -3.4], [99, 29, 0.55], (3000, 3)),
                rng.uniform(0, 1, (3000, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        mine = devkit.lidar_to_top(lidar)
        theirs = ref_util.lidar_to_top(lidar)
        assert mine.shape == theirs.shape
        np.testing.assert_allclose(mine, theirs, atol=1e-5)
        # coords helper parity at a few probe points.
        for x, y in [(0.7, -3.2), (50.0, 10.0), (99.0, 29.0)]:
            assert devkit.lidar_to_top_coords(x, y) == \
                ref_util.lidar_to_top_coords(x, y)

    def test_rigid_and_depth_helpers(self):
        from nerf_from_image_tpu.data import devkit

        R = devkit.rotz(0.3) @ devkit.roty(-0.2) @ devkit.rotx(1.1)
        t = np.array([1.0, -2.0, 3.0])
        Tr = devkit.transform_from_rot_trans(R, t)[:3]
        inv = devkit.inverse_rigid_trans(Tr)
        full = np.eye(4)
        full[:3] = Tr
        inv_full = np.eye(4)
        inv_full[:3] = inv
        np.testing.assert_allclose(inv_full @ full, np.eye(4), atol=1e-12)

        depth = np.arange(12, dtype=np.float64).reshape(3, 4)
        pt3d = devkit.get_depth_pt3d(depth)
        assert pt3d.shape == (12, 3)
        np.testing.assert_allclose(pt3d[5], [1, 1, 5.0])

    def test_drawing_smoke(self, tmp_path):
        from nerf_from_image_tpu.data import devkit
        from nerf_from_image_tpu.data.driving import KittiLabel

        calib, _ = self._calib(tmp_path)
        obj = KittiLabel.parse(
            "Car 0.1 1 -1.57 100 150 300 250 1.5 1.6 3.9 1.0 1.5 20.0 -1.2"
        )
        img = np.zeros((370, 1224, 3), np.uint8)
        out = devkit.show_image_with_boxes(img, [obj], calib, show3d=True)
        assert out.sum() > 0
        out2d = devkit.show_image_with_boxes(img, [obj], calib, show3d=False)
        assert out2d.sum() > 0
        # BEV: raster + footprint overlay.
        corners = devkit.compute_box_3d(obj, calib.P)[1]
        corners_velo = calib.project_rect_to_velo(corners)
        rng = np.random.default_rng(3)
        lidar = np.concatenate(
            [
                rng.uniform([1, -20, -2], [60, 20, 0.5], (500, 3)),
                rng.uniform(0, 1, (500, 1)),
            ],
            axis=1,
        )
        top_img = devkit.draw_top_image(devkit.lidar_to_top(lidar))
        boxed = devkit.draw_box3d_on_top(top_img, [corners_velo])
        assert boxed.shape == top_img.shape
        assert devkit.velo_points_in_box3d(lidar[:, :3], corners_velo).shape[
            1
        ] == 3
