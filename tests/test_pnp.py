"""On-device PnP: synthetic ground-truth recovery + OpenCV oracle parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from nerf_from_image_tpu.pose import pnp


def synth_problem(rng, B=3, H=24, W=24, focal=1.3, noise=0.0):
    """Renders a synthetic coordinate map from a known camera."""
    poses = []
    coords = np.zeros((B, H, W, 3), np.float32)
    masks = np.zeros((B, H, W), bool)
    for b in range(B):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        R = q
        t = np.array([0.1, -0.05, 3.0]) + rng.normal(0, 0.05, 3)
        poses.append((R, t))
        # Random world points in the unit box; project to the pixel grid.
        pts = rng.uniform(-0.5, 0.5, (H * W, 3))
        cam = pts @ R.T + t
        uv = focal * cam[:, :2] / cam[:, 2:3]
        # Fill the coordinate map at the projected pixel (if inside).
        px = np.round((uv[:, 0] + 0.5) * W).astype(int)
        py = np.round((uv[:, 1] + 0.5) * H).astype(int)
        ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
        for p, x, y in zip(pts[ok], px[ok], py[ok]):
            # Store the world point whose projection lands in this pixel,
            # recomputing the exact pixel-center ray to avoid rounding error:
            coords[b, y, x] = p
            masks[b, y, x] = True
    # Re-project exactly through pixel centers: overwrite coords with points
    # that project exactly to their pixel center.
    for b in range(B):
        R, t = poses[b]
        ys, xs = np.where(masks[b])
        for y, x in zip(ys, xs):
            u = x / W - 0.5
            v = y / H - 0.5
            # Keep the same depth as the stored point, move it onto the ray.
            cam = coords[b, y, x] @ R.T + t
            z = cam[2]
            cam_exact = np.array([u / focal * z, v / focal * z, z])
            coords[b, y, x] = (cam_exact - t) @ R
            if noise > 0:
                coords[b, y, x] += rng.normal(0, noise, 3)
    w2c = []
    for R, t in poses:
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = t
        w2c.append(np.diag([1.0, -1.0, -1.0, 1.0]) @ m)
    return coords, masks, np.stack(w2c), focal


class TestPnP:
    def test_recovers_ground_truth(self):
        rng = np.random.default_rng(0)
        coords, masks, w2c_gt, focal = synth_problem(rng)
        guesses = np.array([0.8, 1.0, 1.3, 1.8])
        w2c, f, err = pnp.compute_pose_pnp(
            jnp.asarray(coords), jnp.asarray(masks), jnp.asarray(guesses)
        )
        w2c = np.asarray(w2c)
        np.testing.assert_allclose(np.asarray(f), focal, rtol=1e-6)
        assert np.asarray(err).max() < 1e-3
        np.testing.assert_allclose(w2c, w2c_gt, rtol=1e-3, atol=2e-3)

    def test_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(1)
        coords, masks, _, focal = synth_problem(rng, noise=0.002)
        guesses = np.array([0.9, 1.3, 1.7])
        w2c_j, f_j, err_j = pnp.compute_pose_pnp(
            jnp.asarray(coords), jnp.asarray(masks), jnp.asarray(guesses)
        )
        w2c_cv, f_cv, err_cv = pnp.compute_pose_pnp_opencv(
            coords, masks, guesses
        )
        np.testing.assert_allclose(np.asarray(f_j), f_cv, rtol=1e-6)
        # Rotations agree to a fraction of a degree even with noise.
        for a, b in zip(np.asarray(w2c_j), w2c_cv):
            Ra, Rb = a[:3, :3], b[:3, :3]
            cos = (np.trace(Ra @ Rb.T) - 1) / 2
            assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
            np.testing.assert_allclose(a[:3, 3], b[:3, 3], atol=5e-3)

    def test_degenerate_mask_dummy_pose(self):
        coords = np.zeros((1, 8, 8, 3), np.float32)
        masks = np.zeros((1, 8, 8), bool)
        masks[0, 0, 0] = True  # fewer than 4 points
        w2c, f, err = pnp.compute_pose_pnp(
            jnp.asarray(coords), jnp.asarray(masks), jnp.asarray([1.0, 2.0])
        )
        np.testing.assert_allclose(np.asarray(f), [1.0])
        np.testing.assert_allclose(np.asarray(err), [10.0])
        np.testing.assert_allclose(
            np.asarray(w2c)[0, 2, 3], 10.0
        )  # flip * (-10)

    def test_estimate_poses_batch_roundtrip(self):
        """cam2world from PnP re-projects consistently with get_ray_bundle's
        camera model."""
        from nerf_from_image_tpu.pose.pose import invert_space

        rng = np.random.default_rng(2)
        coords, masks, w2c_gt, focal = synth_problem(rng, B=2)
        cam2world, f, err = pnp.estimate_poses_batch(
            jnp.asarray(coords),
            jnp.asarray(masks.astype(np.float32)),
            np.array([1.3]),
        )
        # Invert back: should match the GT world2cam.
        w2c_back = np.asarray(invert_space(cam2world))
        np.testing.assert_allclose(w2c_back, w2c_gt, rtol=1e-3, atol=2e-3)


class TestForegroundCompaction:
    """_compact_foreground: bit-equivalence when the mask fits the budget
    (the production case), graceful truncation when it doesn't."""

    def test_compacted_solution_is_exact(self):
        rng = np.random.default_rng(11)
        coords, masks, w2c_gt, focal = synth_problem(rng, B=2)
        guesses = jnp.asarray([0.9, 1.3, 2.0])
        full = pnp.compute_pose_pnp(
            jnp.asarray(coords), jnp.asarray(masks), guesses,
            max_points=None,
        )
        # Budget larger than the foreground count but smaller than H*W:
        # must be numerically identical (zero-weight rows drop out of the
        # weighted least squares; row order is irrelevant).
        n_fg = int(masks.sum(axis=(1, 2)).max())
        compact = pnp.compute_pose_pnp(
            jnp.asarray(coords), jnp.asarray(masks), guesses,
            max_points=min(n_fg + 8, coords.shape[1] * coords.shape[2] - 1),
        )
        for a, b in zip(full, compact):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_compaction_oversized_mask_is_unbiased(self):
        """When the foreground exceeds the budget, the kept subset must span
        the whole object, not its top rows (advisor round-3 finding: plain
        scan-order truncation kept only the top of close-range objects)."""
        H = W = 32
        coords = np.zeros((1, H, W, 3), np.float32)
        masks = np.ones((1, H, W), bool)  # full-frame foreground
        coords[..., 0] = np.linspace(-1, 1, W)[None, None, :]
        coords[..., 1] = np.linspace(-1, 1, H)[None, :, None]
        budget = (H * W) // 4
        pts = jnp.asarray(coords.reshape(1, -1, 3))
        ii = np.arange(W, dtype=np.float32)[None, :] / W - 0.5
        jj = np.arange(H, dtype=np.float32)[:, None] / H - 0.5
        uv = np.broadcast_to(
            np.stack(np.broadcast_arrays(ii, jj), -1).reshape(1, -1, 2),
            (1, H * W, 2),
        )
        w = jnp.asarray(masks.reshape(1, -1).astype(np.float32))
        _, uv_kept, w_kept = pnp._compact_foreground(
            pts, jnp.asarray(uv), w, budget
        )
        uv_kept = np.asarray(uv_kept)[0][np.asarray(w_kept)[0] > 0]
        # Kept v-coordinates (image rows) must cover both halves roughly
        # evenly; scan-order truncation keeps only v < 0 here.
        frac_bottom = float(np.mean(uv_kept[:, 1] > 0))
        assert 0.4 < frac_bottom < 0.6, frac_bottom
        # Means of the kept pixel grid stay near-centered (a strided
        # subset has at most a half-stride offset; the scan-order bug
        # produced mean v ~= -0.37 here).
        assert abs(float(np.mean(uv_kept[:, 0]))) < 0.1
        assert abs(float(np.mean(uv_kept[:, 1]))) < 0.1

    def test_truncated_budget_still_recovers_pose(self):
        rng = np.random.default_rng(12)
        coords, masks, w2c_gt, focal = synth_problem(rng, B=2, H=32, W=32)
        n_fg = int(masks.sum(axis=(1, 2)).min())
        cam, f, err = pnp.compute_pose_pnp(
            jnp.asarray(coords), jnp.asarray(masks),
            jnp.asarray([0.9, 1.3, 2.0]),
            max_points=max(n_fg // 2, 8),
        )
        from nerf_from_image_tpu.pose.pose import invert_space  # noqa

        # With half the foreground the pose is still recovered well.
        w2c = np.asarray(cam)
        np.testing.assert_allclose(w2c, w2c_gt, rtol=0.1, atol=0.1)
