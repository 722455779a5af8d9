"""End-to-end train.py drive in encoder mode: the train-time evaluate()
must emit the reference's reconstruction scalars for BOTH the train-eval
split and the held-out test split (reference: run.py:1365-1401 —
reconstruction/{psnr,ssim,lpips}[_test]_{front,random}; FID variants appear
only when Inception weights are available)."""

import sys

import numpy as np
import pytest

import jax


def test_use_encoder_emits_recon_and_testset_scalars(monkeypatch, tmp_path):
    from nerf_from_image_tpu.utils import tb

    recorded = {}

    orig_scalar = tb.Logger.scalar

    def spy_scalar(self, tag, value, step):
        recorded[tag] = float(value)
        return orig_scalar(self, tag, value, step)

    monkeypatch.setattr(tb.Logger, "scalar", spy_scalar)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train.py",
            "--dataset", "synthetic",
            "--use_encoder",
            "--chips", "2",
            "--batch_size", "2",
            "--resolution", "16",
            "--iterations", "4",
            "--display_every", "4",
            "--max_images", "8",
            "--root_path", str(tmp_path),
            "--sdf_pretrain_steps", "2",
            "--fine_sampling", "",
        ],
    )
    import train

    train.main()

    # Train-eval split recon scalars (front scored; random scored only
    # with >1 views/object — synthetic has 1, so random emits no psnr).
    for tag in (
        "reconstruction/psnr_front",
        "reconstruction/ssim_front",
        "reconstruction/lpips_front",
    ):
        assert tag in recorded, sorted(recorded)
        assert np.isfinite(recorded[tag]), (tag, recorded[tag])
    # Held-out test split variants (reference run.py:1391-1398).
    for tag in (
        "reconstruction/psnr_test_front",
        "reconstruction/ssim_test_front",
        "reconstruction/lpips_test_front",
    ):
        assert tag in recorded, sorted(recorded)
        assert np.isfinite(recorded[tag]), (tag, recorded[tag])
    # No Inception weights in this environment -> no FID scalars.
    assert "fid" not in recorded


def test_train_driver_plane_splat_engages(monkeypatch, tmp_path):
    """`train.py --plane_splat true --query_chunk 0` routes the G-step's
    main render backward through the Pallas splat op (interpret mode on
    CPU) — verifies the driver wiring, incl. the 0 -> unchunked
    query_chunk normalization the splat_spec check requires."""
    from nerf_from_image_tpu.ops.pallas import splat as splat_mod

    calls = []
    orig = splat_mod.triplane_sample_mean

    def spy(*a, **k):
        calls.append(a[2])  # img_shape
        return orig(*a, **k)

    monkeypatch.setattr(splat_mod, "triplane_sample_mean", spy)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train.py",
            "--dataset", "synthetic",
            "--chips", "2",
            "--batch_size", "2",
            "--resolution", "16",
            "--iterations", "2",
            "--display_every", "100",
            "--max_images", "4",
            "--root_path", str(tmp_path),
            "--sdf_pretrain_steps", "1",
            "--fine_sampling", "",
            "--plane_splat", "true",
            "--query_chunk", "0",
        ],
    )
    import train

    train.main()
    assert calls, "plane_splat never reached the splat op"
    assert (16, 16, 128) in calls, calls
