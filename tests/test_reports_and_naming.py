"""Reports, experiment naming, and pose-perturbation ablation.

Covers the aux components around the engines: the inversion report
writer/re-aggregator (reference: run.py:2338-2404, evaluate_saved_result.py),
the config-derived experiment name (reference: arguments.py:222-276), and
`perturb_poses` (reference: lib/pose_utils.py:171-186).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, import_reference_module, reference_available


def _random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    mats = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = q
        mats.append(m)
    return np.stack(mats)


class TestPerturbPoses:
    def test_permutes_and_respects_targets(self):
        from nerf_from_image_tpu.pose.pose import (
            perturb_poses,
            rotation_matrix_distance,
        )
        import jax.numpy as jnp

        poses = _random_rotations(32)
        focal = np.arange(32, dtype=np.float32)
        out, focal_out = perturb_poses(poses, 30.0, focal)
        assert out.shape == poses.shape
        # Every output pose is one of the dataset poses, and the extra arg
        # follows the same permutation.
        for i in range(len(out)):
            dists = np.asarray(
                rotation_matrix_distance(
                    jnp.broadcast_to(jnp.asarray(out[i]), poses.shape),
                    jnp.asarray(poses),
                )
            )
            j = int(dists.argmin())
            # arccos near trace=3 is ill-conditioned in fp32; self-distance
            # computes as a few hundredths of a degree.
            assert dists[j] < 0.1
            assert focal_out[i] == focal[j]

    @pytest.mark.skipif(not reference_available(), reason="needs reference")
    def test_golden_with_shared_targets(self):
        """With identical target distances, the permutation matches the
        reference exactly (RNG sequences differ across frameworks, so the
        targets are generated once with the reference's own torch recipe)."""
        import torch

        ref_pose_utils = import_reference_module("lib.pose_utils")
        from nerf_from_image_tpu.pose.pose import perturb_poses

        poses = _random_rotations(24, seed=3)
        avg_angle = 45.0
        gen = torch.Generator().manual_seed(1234)
        targets = np.asarray(
            [
                (torch.rand((1,), generator=gen) * avg_angle * 2).item()
                for _ in range(len(poses))
            ]
        )
        ref_out, = ref_pose_utils.perturb_poses(
            torch.from_numpy(poses), avg_angle
        ),
        got, = perturb_poses(poses, avg_angle, target_distances=targets)
        np.testing.assert_allclose(got, ref_out[0].numpy(), atol=1e-6)


class TestExperimentName:
    @pytest.mark.skipif(not reference_available(), reason="needs reference")
    @pytest.mark.parametrize(
        "argv",
        [
            [],
            ["--dataset", "cub", "--use_encoder", "--r1", "3.0",
             "--tv", "0.1", "--entropy", "0.05"],
            ["--dataset", "carla", "--use_viewdir", "--augment_p", "0.3",
             "--augment_ada", "--perturb_poses", "10.0",
             "--path_length_regularization"],
            ["--dataset", "imagenet_car", "--use_class",
             "--dual_discriminator_l1", "--supervise_alpha",
             "--xid", "exp7"],
        ],
    )
    def test_matches_reference(self, argv):
        ref_arguments = import_reference_module("arguments")
        from nerf_from_image_tpu import arguments

        # The reference parser exits on unknown args; both parsers accept
        # these shared flags.
        old_argv = sys.argv
        try:
            sys.argv = ["prog"] + argv
            ref_args = ref_arguments.parse_args()
        finally:
            sys.argv = old_argv
        args = arguments.parse_args(argv)
        assert arguments.suggest_experiment_name(
            args
        ) == ref_arguments.suggest_experiment_name(ref_args)


class TestGpusAlias:
    def test_gpus_maps_to_chips(self):
        """Reference-CLI `--gpus N` (reference arguments.py:22-25) selects
        the mesh size unless `--chips` is given explicitly."""
        from nerf_from_image_tpu import arguments

        assert arguments.parse_args(["--gpus", "4"]).chips == 4
        assert arguments.parse_args(["--gpus", "4", "--chips", "2"]).chips == 2
        assert arguments.parse_args([]).chips == 0

    def test_plane_splat_flag(self):
        from nerf_from_image_tpu import arguments

        assert arguments.parse_args([]).plane_splat is False
        assert arguments.parse_args(
            ["--plane_splat", "true"]
        ).plane_splat is True
        assert arguments.parse_args(
            ["--plane_splat", ""]
        ).plane_splat is False


class TestReportRoundtrip:
    def test_save_and_reaggregate(self, tmp_path):
        from nerf_from_image_tpu.engine.evaluate import InversionReport

        report = InversionReport([0, 30])
        for _ in range(3):
            for step in (0, 30):
                report.add(
                    step,
                    {
                        "psnr": np.random.rand(2).astype(np.float32) * 30,
                        "rot_error": np.random.rand(2).astype(np.float32),
                    },
                )
        prefix = os.path.join(str(tmp_path), "report")
        report.save(prefix)
        assert os.path.exists(prefix + ".npz")
        assert os.path.exists(prefix + ".txt")

        cons = report.consolidated()
        assert cons[0]["psnr"].shape == (6,)

        # Resume: load() rebuilds the accumulator and num_samples() gives
        # the image cursor (reference resumes by index, run.py:1858-1871).
        loaded = InversionReport.load(prefix)
        assert loaded.checkpoint_steps == [0, 30]
        assert loaded.num_samples() == 6
        loaded.add(0, {"psnr": np.zeros(2, np.float32),
                       "rot_error": np.zeros(2, np.float32)})
        assert loaded.num_samples() == 8
        np.testing.assert_allclose(
            loaded.consolidated()[30]["psnr"], cons[30]["psnr"]
        )

        # Metric notes persist through save/load: a report accumulated
        # with random-feature LPIPS keeps its stamp on resume even if the
        # resuming environment has real weights (advisor round-3 finding).
        stamped = InversionReport(
            [0], {"lpips": "(RANDOM-FEATURE — not metric grade)"}
        )
        stamped.add(0, {"lpips": np.random.rand(2).astype(np.float32)})
        stamped.save(os.path.join(str(tmp_path), "stamped"))
        reloaded = InversionReport.load(
            os.path.join(str(tmp_path), "stamped")
        )
        assert reloaded.metric_notes == stamped.metric_notes
        assert "RANDOM-FEATURE" in reloaded.summary()

        # Resume-time note reconciliation covers all four directions
        # (advisor round-4 finding: the metric-grade -> noted direction
        # must carry a mixed marker too).
        rf = "(RANDOM-FEATURE — not metric grade)"
        r = InversionReport([0], {"lpips": rf})
        r.merge_notes_on_resume({"lpips": rf})  # unchanged env
        assert r.metric_notes["lpips"] == rf
        r = InversionReport([0], {"lpips": rf})
        r.merge_notes_on_resume({})  # noted rows, now metric grade
        assert r.metric_notes["lpips"] == f"{rf} (mixed: resumed at metric grade)"
        r = InversionReport([0], {})
        r.merge_notes_on_resume({"lpips": rf})  # metric-grade rows, now noted
        assert r.metric_notes["lpips"] == (
            f"{rf} (mixed: metric-grade rows before resume)"
        )
        r = InversionReport([0], {"lpips": "(note A)"})
        r.merge_notes_on_resume({"lpips": "(note B)"})  # conflicting notes
        assert r.metric_notes["lpips"] == "(note A) + resumed with (note B)"

        # The re-aggregator CLI prints per-checkpoint means from the npz.
        res = subprocess.run(
            [sys.executable,
             os.path.join(REPO_ROOT, "evaluate_saved_result.py"),
             prefix + ".npz"],
            capture_output=True, text=True, check=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert "psnr" in res.stdout
        assert f"{float(np.mean(cons[30]['psnr'])):.5f}" in res.stdout


class TestFileIO:
    """GCS-aware IO helpers (reference: lib/utils.py:23-56). Local-path
    behavior is tested directly; gs:// routes through tf.io.gfile and is
    exercised only when a bucket is configured."""

    def test_local_roundtrip_and_replace(self, tmp_path):
        from nerf_from_image_tpu.utils import fileio

        d = tmp_path / "a" / "b"
        fileio.mkdir(str(d))
        assert d.is_dir()
        p = d / "x.txt"
        with fileio.open_file(str(p), "w") as f:
            f.write("hello")
        assert fileio.file_exists(str(p))
        with fileio.open_file(str(p), "r") as f:
            assert f.read() == "hello"
        tmp = d / "x.tmp"
        with fileio.open_file(str(tmp), "w") as f:
            f.write("v2")
        fileio.replace_file(str(tmp), str(p))
        with fileio.open_file(str(p), "r") as f:
            assert f.read() == "v2"
        assert not tmp.exists()
        assert fileio.is_gcs("gs://bucket/x") and not fileio.is_gcs("/x")
