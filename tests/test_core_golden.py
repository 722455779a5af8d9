"""Golden tests: core ray-march math vs the PyTorch reference oracle.

Each test builds random-but-fixed inputs, runs the reference implementation
(imported from the read-only reference checkout) and our JAX implementation,
and asserts allclose in strict fp32. Deterministic variants only (RNG parity
across frameworks is impossible by construction).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import import_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_nerf_utils():
    return import_reference_module("lib.nerf_utils")


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _random_pose(rng, batch, ortho=False):
    """Random cam2world with orthonormal rotation, camera ~3.5 units away."""
    mats = []
    for _ in range(batch):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.5])
        if ortho:
            m[3, 3] = 1.0 / (0.8 + 0.4 * rng.random())
        mats.append(m)
    return np.stack(mats).astype(np.float32)


class TestRayBundle:
    @pytest.mark.parametrize("use_center", [False, True])
    @pytest.mark.parametrize("use_bbox", [False, True])
    def test_perspective(self, ref_nerf_utils, use_center, use_bbox):
        from nerf_from_image_tpu.ops import rays

        rng = np.random.default_rng(0)
        B, H, W = 3, 17, 23
        pose = _random_pose(rng, B)
        focal = (1.0 + rng.random(B)).astype(np.float32)
        bbox = (
            np.abs(rng.standard_normal((B, 2, 2))).astype(np.float32)
            if use_bbox
            else None
        )
        center = (
            rng.random((B, 2)).astype(np.float32) if use_center else None
        )

        ref_o, ref_d = ref_nerf_utils.get_ray_bundle(
            H,
            W,
            torch.from_numpy(focal),
            torch.from_numpy(pose),
            torch.from_numpy(bbox) if bbox is not None else None,
            torch.from_numpy(center) if center is not None else None,
        )
        got_o, got_d = rays.get_ray_bundle(
            H,
            W,
            jnp.asarray(focal),
            jnp.asarray(pose),
            jnp.asarray(bbox) if bbox is not None else None,
            jnp.asarray(center) if center is not None else None,
        )
        np.testing.assert_allclose(
            np.asarray(got_o), ref_o.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got_d), ref_d.numpy(), rtol=1e-5, atol=1e-6
        )

    @pytest.mark.parametrize("use_bbox", [False, True])
    def test_ortho(self, ref_nerf_utils, use_bbox):
        from nerf_from_image_tpu.ops import rays

        rng = np.random.default_rng(1)
        B, H, W = 2, 19, 13
        pose = _random_pose(rng, B, ortho=True)
        bbox = (
            np.abs(rng.standard_normal((B, 2, 2))).astype(np.float32)
            if use_bbox
            else None
        )

        ref_o, ref_d = ref_nerf_utils.get_ray_bundle(
            H,
            W,
            None,
            torch.from_numpy(pose),
            torch.from_numpy(bbox) if bbox is not None else None,
            None,
        )
        got_o, got_d = rays.get_ray_bundle(
            H,
            W,
            None,
            jnp.asarray(pose),
            jnp.asarray(bbox) if bbox is not None else None,
            None,
        )
        np.testing.assert_allclose(
            np.asarray(got_o), ref_o.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got_d), ref_d.numpy(), rtol=1e-5, atol=1e-6
        )


class TestNearFar:
    def test_matches_reference(self, ref_nerf_utils):
        from nerf_from_image_tpu.ops import aabb, rays

        rng = np.random.default_rng(2)
        B, H, W = 2, 16, 16
        pose = _random_pose(rng, B)
        focal = (1.0 + rng.random(B)).astype(np.float32)
        o, d = rays.get_ray_bundle(H, W, jnp.asarray(focal), jnp.asarray(pose))
        d = rays.normalize_directions(d)
        o_np, d_np = np.asarray(o), np.asarray(d)

        ref_near, ref_far = ref_nerf_utils.compute_near_far_planes(
            torch.from_numpy(o_np), torch.from_numpy(d_np), 1.1 / 2
        )
        near, far = aabb.compute_near_far_planes(o, d, 1.1 / 2)
        np.testing.assert_allclose(
            np.asarray(near), ref_near.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(far), ref_far.numpy(), rtol=1e-5, atol=1e-6
        )

    def test_all_misses_filled(self, ref_nerf_utils):
        """Rays pointing away from the box get hit-set min/max fill values."""
        from nerf_from_image_tpu.ops import aabb

        rng = np.random.default_rng(3)
        o = np.tile(np.array([0.0, 0.0, 3.0], np.float32), (1, 4, 4, 1))
        d = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
        d[..., 2] = -np.abs(d[..., 2])
        d[0, 0, 0] = [0.0, 0.0, 1.0]  # points away: miss
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        ref_near, ref_far = ref_nerf_utils.compute_near_far_planes(
            torch.from_numpy(o.copy()), torch.from_numpy(d.copy()), 0.55
        )
        near, far = aabb.compute_near_far_planes(
            jnp.asarray(o), jnp.asarray(d), 0.55
        )
        np.testing.assert_allclose(
            np.asarray(near), ref_near.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(far), ref_far.numpy(), rtol=1e-5, atol=1e-6
        )


class TestSampling:
    def test_query_points_deterministic(self, ref_nerf_utils):
        from nerf_from_image_tpu.ops import sampling

        rng = np.random.default_rng(4)
        B, H, W, S = 2, 5, 7, 64
        o = _rand(rng, B, H, W, 3)
        d = _rand(rng, B, H, W, 3)
        near = np.abs(_rand(rng, B, H, W)) + 0.5
        far = near + np.abs(_rand(rng, B, H, W)) + 1.0

        ref_pts, ref_depths = ref_nerf_utils.compute_query_points_from_rays(
            torch.from_numpy(o),
            torch.from_numpy(d),
            torch.from_numpy(near),
            torch.from_numpy(far),
            S,
            randomize=False,
        )
        pts, depths = sampling.compute_query_points_from_rays(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(near), jnp.asarray(far), S
        )
        np.testing.assert_allclose(
            np.asarray(depths), ref_depths.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pts), ref_pts.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_sample_pdf_deterministic(self, ref_nerf_utils):
        from nerf_from_image_tpu.ops import sampling

        rng = np.random.default_rng(5)
        N, M, S = 37, 63, 64
        bins = np.sort(rng.random((N, M)).astype(np.float32), axis=-1) * 4 + 1
        weights = np.abs(_rand(rng, N, M - 1))

        ref = ref_nerf_utils.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), S, deterministic=True
        )
        got = sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), S)
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_jitter_stays_in_bins(self):
        from nerf_from_image_tpu.ops import sampling

        rng = np.random.default_rng(6)
        o = _rand(rng, 1, 4, 4, 3)
        d = _rand(rng, 1, 4, 4, 3)
        near = np.full((1, 4, 4), 1.0, np.float32)
        far = np.full((1, 4, 4), 3.0, np.float32)
        _, depths = sampling.compute_query_points_from_rays(
            jnp.asarray(o),
            jnp.asarray(d),
            jnp.asarray(near),
            jnp.asarray(far),
            16,
            key=jax.random.key(0),
        )
        depths = np.asarray(depths)
        assert (depths >= 1.0).all() and (depths <= 3.0 + 2.0 / 16).all()
        assert (np.diff(depths, axis=-1) > -2.0 / 16).all()

    def test_per_batch_near_far_shares_jitter_across_pixels(self):
        """rand_like(depth_values) semantics (reference nerf_utils.py:
        110-117): per-batch near/far expand to [B,1,1,S], so one jitter
        pattern is shared by every pixel of an image."""
        from nerf_from_image_tpu.ops import sampling

        rng = np.random.default_rng(7)
        o = _rand(rng, 2, 3, 5, 3)
        d = _rand(rng, 2, 3, 5, 3)
        near = np.asarray([1.0, 1.5], np.float32)
        far = np.asarray([3.0, 2.5], np.float32)
        pts, depths = sampling.compute_query_points_from_rays(
            jnp.asarray(o),
            jnp.asarray(d),
            jnp.asarray(near),
            jnp.asarray(far),
            8,
            key=jax.random.key(1),
        )
        depths = np.asarray(depths)
        # Depth values keep the reference's [B,1,1,S] broadcast shape —
        # one jittered pattern per image, NOT drawn per pixel.
        assert depths.shape == (2, 1, 1, 8)
        assert np.asarray(pts).shape == (2, 3, 5, 8, 3)
        # Jitter actually applied (not the deterministic left edges).
        det = near[:, None] + (far - near)[:, None] * np.arange(8) / 8
        assert np.abs(depths[:, 0, 0, :] - det).max() > 0


class TestCompositing:
    def test_forward_matches(self, ref_nerf_utils):
        from nerf_from_image_tpu.ops import compositing

        rng = np.random.default_rng(7)
        B, H, W, S = 2, 6, 5, 32
        sigma = np.abs(_rand(rng, B, H, W, S)) * 3
        rgbv = rng.random((B, H, W, S, 3)).astype(np.float32)
        d = _rand(rng, B, H, W, 3)
        o = _rand(rng, B, H, W, 3)
        depths = np.sort(rng.random((B, H, W, S)).astype(np.float32) * 3 + 1, axis=-1)
        normals = _rand(rng, B, H, W, S, 3)
        sem = rng.random((B, H, W, S, 10)).astype(np.float32)

        for white in [True, False]:
            ref_rgb, ref_depth, ref_mask, ref_norm, ref_sem = (
                ref_nerf_utils.render_volume_density(
                    torch.from_numpy(sigma),
                    torch.from_numpy(rgbv),
                    torch.from_numpy(o),
                    torch.from_numpy(d),
                    torch.from_numpy(depths),
                    torch.from_numpy(normals),
                    torch.from_numpy(sem),
                    white_background=white,
                )
            )
            out = compositing.render_volume_density(
                jnp.asarray(sigma),
                jnp.asarray(rgbv),
                jnp.asarray(d),
                jnp.asarray(depths),
                jnp.asarray(normals),
                jnp.asarray(sem),
                white_background=white,
            )
            np.testing.assert_allclose(
                np.asarray(out.rgb), ref_rgb.numpy(), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(out.depth), ref_depth.numpy(), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(out.mask), ref_mask.numpy(), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(out.normals), ref_norm.numpy(), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(out.semantics), ref_sem.numpy(), rtol=1e-5, atol=1e-5
            )

    def test_gradients_match(self, ref_nerf_utils):
        """Pixel-loss gradients w.r.t. sigma and rgb match the reference,
        including the stop-gradient placement on depth/normal weights."""
        from nerf_from_image_tpu.ops import compositing

        rng = np.random.default_rng(8)
        B, H, W, S = 1, 4, 4, 16
        sigma = np.abs(_rand(rng, B, H, W, S))
        rgbv = rng.random((B, H, W, S, 3)).astype(np.float32)
        d = _rand(rng, B, H, W, 3)
        o = _rand(rng, B, H, W, 3)
        depths = np.sort(rng.random((B, H, W, S)).astype(np.float32) * 2 + 1, axis=-1)
        normals = _rand(rng, B, H, W, S, 3)

        sigma_t = torch.from_numpy(sigma).requires_grad_()
        rgb_t = torch.from_numpy(rgbv).requires_grad_()
        normals_t = torch.from_numpy(normals).requires_grad_()
        ref_rgb, ref_depth, ref_mask, ref_norm, _ = (
            ref_nerf_utils.render_volume_density(
                sigma_t,
                rgb_t,
                torch.from_numpy(o),
                torch.from_numpy(d),
                torch.from_numpy(depths),
                normals_t,
                None,
                white_background=True,
            )
        )
        loss_t = (
            ref_rgb.square().sum()
            + ref_depth.square().sum()
            + ref_mask.square().sum()
            + ref_norm.square().sum()
        )
        loss_t.backward()

        def loss_fn(sigma_j, rgb_j, normals_j):
            out = compositing.render_volume_density(
                sigma_j,
                rgb_j,
                jnp.asarray(d),
                jnp.asarray(depths),
                normals_j,
                None,
                white_background=True,
            )
            return (
                jnp.square(out.rgb).sum()
                + jnp.square(out.depth).sum()
                + jnp.square(out.mask).sum()
                + jnp.square(out.normals).sum()
            )

        grads = jax.grad(loss_fn, argnums=(0, 1, 2))(
            jnp.asarray(sigma), jnp.asarray(rgbv), jnp.asarray(normals)
        )
        np.testing.assert_allclose(
            np.asarray(grads[0]), sigma_t.grad.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(grads[1]), rgb_t.grad.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(grads[2]), normals_t.grad.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_smooth_weights_matches_engine(self):
        """smooth_weights == F.max_pool1d(..., 2, 1, padding=1) then
        F.avg_pool1d(..., 2, 1) + 0.01 (reference: run.py:267-272)."""
        import torch.nn.functional as F

        from nerf_from_image_tpu.ops import compositing

        rng = np.random.default_rng(9)
        w = np.abs(rng.standard_normal((37, 64)).astype(np.float32))
        ref = F.max_pool1d(torch.from_numpy(w).unsqueeze(1), 2, 1, padding=1)
        ref = F.avg_pool1d(ref, 2, 1).squeeze(1).numpy() + 0.01
        got = compositing.smooth_weights(jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)


class TestGridSample:
    def test_matches_reference_and_torch(self):
        ref_ops = import_reference_module("lib.ops")
        import torch.nn.functional as F

        from nerf_from_image_tpu.ops import grid_sample

        rng = np.random.default_rng(10)
        B, C, H, W, N = 2, 32, 19, 23, 111
        table = _rand(rng, B, C, H, W)
        coords = (rng.random((B, 1, N, 2)).astype(np.float32) * 2.6 - 1.3)

        ref = ref_ops.grid_sample2d(
            torch.from_numpy(table), torch.from_numpy(coords)
        ).numpy()
        ref_torch = F.grid_sample(
            torch.from_numpy(table),
            torch.from_numpy(coords),
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        ).numpy()

        got = grid_sample.grid_sample_2d(
            jnp.asarray(np.transpose(table, (0, 2, 3, 1))),
            jnp.asarray(coords.reshape(B, N, 2)),
        )
        got_nchw = np.transpose(np.asarray(got), (0, 2, 1)).reshape(B, C, 1, N)
        np.testing.assert_allclose(got_nchw, ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_nchw, ref_torch, rtol=1e-5, atol=1e-5)

    def test_double_backward(self):
        """grad-of-grad through the sampler (needed by the eikonal loss)."""
        from nerf_from_image_tpu.ops import grid_sample

        rng = np.random.default_rng(11)
        table = jnp.asarray(_rand(rng, 1, 8, 8, 4))
        coords = jnp.asarray(rng.random((1, 5, 2)).astype(np.float32) - 0.5)

        def f(c):
            return grid_sample.grid_sample_2d(table, c).sum()

        g = jax.grad(lambda c: jnp.square(jax.grad(f)(c)).sum())(coords)
        assert np.isfinite(np.asarray(g)).all()

    def test_zeros_packed_matches_unpacked(self):
        """The corner-packed zeros sampler (used by ADA augmentation) is
        bit-compatible with the 4-gather path, values and gradients,
        including out-of-range and boundary-straddling coordinates."""
        import torch
        import torch.nn.functional as F

        from nerf_from_image_tpu.ops import grid_sample

        rng = np.random.default_rng(12)
        B, H, W, C, N = 3, 13, 17, 6, 257
        table = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        # Mix of interior, boundary-straddling, and far out-of-range coords.
        coords = jnp.asarray(
            rng.random((B, N, 2)) * 3.2 - 1.6, jnp.float32
        )

        ref = grid_sample.grid_sample_2d_zeros(table, coords)
        got = grid_sample.grid_sample_2d_zeros_packed(table, coords)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

        # torch grid_sample zeros/align_corners=False oracle.
        ref_torch = F.grid_sample(
            torch.from_numpy(np.asarray(table).transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(coords).reshape(B, 1, N, 2)),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        ).numpy()
        got_nchw = np.transpose(np.asarray(got), (0, 2, 1)).reshape(
            B, C, 1, N
        )
        np.testing.assert_allclose(got_nchw, ref_torch, rtol=1e-5, atol=1e-5)

        def loss_unpacked(t, c):
            return jnp.sum(grid_sample.grid_sample_2d_zeros(t, c) ** 2)

        def loss_packed(t, c):
            return jnp.sum(grid_sample.grid_sample_2d_zeros_packed(t, c) ** 2)

        g_ref = jax.grad(loss_unpacked, argnums=(0, 1))(table, coords)
        g_got = jax.grad(loss_packed, argnums=(0, 1))(table, coords)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )


class TestPose:
    @pytest.fixture(scope="class")
    def ref_pose_utils(self):
        return import_reference_module("lib.pose_utils")

    @pytest.mark.parametrize("flipped", [False, True])
    def test_roundtrip_perspective(self, ref_pose_utils, flipped):
        from nerf_from_image_tpu import pose as pose_mod

        rng = np.random.default_rng(12)
        B = 8
        q = rng.standard_normal((B, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        z0 = rng.standard_normal(B).astype(np.float32) * 0.3
        t2 = rng.standard_normal((B, 2)).astype(np.float32) * 0.1
        s = (1.0 + rng.random(B)).astype(np.float32)

        ref_mat, ref_f = ref_pose_utils.pose_to_matrix(
            torch.from_numpy(z0),
            torch.from_numpy(t2),
            torch.from_numpy(s),
            torch.from_numpy(q),
            camera_flipped=flipped,
        )
        mat, f = pose_mod.pose_to_matrix(
            jnp.asarray(z0), jnp.asarray(t2), jnp.asarray(s), jnp.asarray(q), flipped
        )
        np.testing.assert_allclose(
            np.asarray(mat), ref_mat.numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(f), ref_f.numpy(), rtol=1e-5, atol=1e-6
        )

        # Round-trip self-consistency (the reference's matrix_to_pose is
        # broken under numpy>=2 — np.array(copy=False) — so it cannot serve
        # as oracle here; pose_to_matrix equality above anchors conventions).
        z0_r, t2_r, s_r, q_r = pose_mod.matrix_to_pose(mat, f, flipped)
        np.testing.assert_allclose(np.asarray(z0_r), z0, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t2_r), t2, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_r), s, rtol=1e-4, atol=1e-5)
        qr = np.asarray(q_r)
        sign = np.sign(np.sum(qr * q, axis=-1, keepdims=True))
        np.testing.assert_allclose(qr * sign, q, rtol=1e-3, atol=1e-4)

    def test_matrix_to_quaternion_vs_scipy(self):
        from scipy.spatial.transform import Rotation

        from nerf_from_image_tpu import pose as pose_mod

        rng = np.random.default_rng(99)
        rot = Rotation.random(32, random_state=7)
        mats = np.tile(np.eye(4, dtype=np.float32), (32, 1, 1))
        mats[:, :3, :3] = rot.as_matrix().astype(np.float32)
        got = np.asarray(pose_mod.matrix_to_quaternion(jnp.asarray(mats)))
        want = rot.as_quat()[:, [3, 0, 1, 2]]  # scipy xyzw -> wxyz
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, rtol=1e-4, atol=1e-5)
        del rng

    @pytest.mark.parametrize("flipped", [False, True])
    def test_roundtrip_ortho(self, ref_pose_utils, flipped):
        from nerf_from_image_tpu import pose as pose_mod

        rng = np.random.default_rng(13)
        B = 6
        q = rng.standard_normal((B, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        t2 = rng.standard_normal((B, 2)).astype(np.float32) * 0.1
        s = (1.0 + rng.random(B)).astype(np.float32)

        # The fork's ortho branch divides a [B, 3] by s without unsqueezing
        # (reference lib/pose_utils.py:69), which only broadcasts when B == 3;
        # feed s as [B, 1] to exercise the intended per-sample semantics.
        ref_mat, ref_f = ref_pose_utils.pose_to_matrix(
            None,
            torch.from_numpy(t2),
            torch.from_numpy(s[:, None]),
            torch.from_numpy(q),
            camera_flipped=flipped,
        )
        assert ref_f is None
        mat, f = pose_mod.pose_to_matrix(
            None, jnp.asarray(t2), jnp.asarray(s), jnp.asarray(q), flipped
        )
        assert f is None
        np.testing.assert_allclose(
            np.asarray(mat), ref_mat.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_conditioning_vector(self, ref_pose_utils):
        from nerf_from_image_tpu import pose as pose_mod

        rng = np.random.default_rng(14)
        B = 5
        pose_np = _random_pose(rng, B)
        focal = (1.0 + rng.random(B)).astype(np.float32)

        ref = ref_pose_utils.matrix_to_conditioning_vector(
            torch.from_numpy(pose_np), torch.from_numpy(focal), True
        ).numpy()
        got = pose_mod.matrix_to_conditioning_vector(
            jnp.asarray(pose_np), jnp.asarray(focal), True
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)

    def test_rotation_distance(self, ref_pose_utils):
        from nerf_from_image_tpu import pose as pose_mod

        rng = np.random.default_rng(15)
        p = _random_pose(rng, 6)
        q = _random_pose(rng, 6)
        ref = ref_pose_utils.rotation_matrix_distance(
            torch.from_numpy(p), torch.from_numpy(q)
        ).numpy()
        got = pose_mod.rotation_matrix_distance(jnp.asarray(p), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


class TestCompositeDual:
    """Sort-free dual-list compositing == sort-merge + render_volume_density,
    values and gradients (ops/compositing.composite_dual)."""

    def _make(self, rng, B, H, W, S):
        sigma_a = np.abs(_rand(rng, B, H, W, S)) * 3
        sigma_b = np.abs(_rand(rng, B, H, W, S)) * 3
        rgb_a = rng.random((B, H, W, S, 3)).astype(np.float32)
        rgb_b = rng.random((B, H, W, S, 3)).astype(np.float32)
        depth_a = np.sort(
            rng.random((B, H, W, S)).astype(np.float32) * 3 + 1, axis=-1
        )
        depth_b = np.sort(
            rng.random((B, H, W, S)).astype(np.float32) * 3 + 1, axis=-1
        )
        dirs = _rand(rng, B, H, W, 3)
        return sigma_a, rgb_a, depth_a, sigma_b, rgb_b, depth_b, dirs

    def _sorted_reference(self, sigma_a, rgb_a, depth_a, sigma_b, rgb_b,
                          depth_b, dirs, white):
        from nerf_from_image_tpu.ops import compositing

        depths = jnp.concatenate((depth_a, depth_b), axis=-1)
        order = jnp.argsort(depths, axis=-1)
        sigma = jnp.take_along_axis(
            jnp.concatenate((sigma_a, sigma_b), axis=-1), order, axis=-1
        )
        depths_s = jnp.take_along_axis(depths, order, axis=-1)
        rgb = jnp.take_along_axis(
            jnp.concatenate((rgb_a, rgb_b), axis=-2),
            order[..., None],
            axis=-2,
        )
        return compositing.render_volume_density(
            sigma, rgb, dirs, depths_s, white_background=white
        )

    @pytest.mark.parametrize("white", [True, False])
    def test_forward_matches_sorted(self, white):
        from nerf_from_image_tpu.ops import compositing

        rng = np.random.default_rng(21)
        args = self._make(rng, 2, 5, 4, 24)
        sigma_a, rgb_a, depth_a, sigma_b, rgb_b, depth_b, dirs = map(
            jnp.asarray, args
        )
        ref = self._sorted_reference(
            sigma_a, rgb_a, depth_a, sigma_b, rgb_b, depth_b, dirs, white
        )
        out = compositing.composite_dual(
            sigma_a, depth_a, {"rgb": rgb_a},
            sigma_b, depth_b, {"rgb": rgb_b},
            dirs, white_background=white,
        )
        np.testing.assert_allclose(
            np.asarray(out.rgb), np.asarray(ref.rgb), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.depth), np.asarray(ref.depth), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.mask), np.asarray(ref.mask), rtol=2e-5, atol=2e-5
        )

    def test_gradients_match_sorted(self):
        from nerf_from_image_tpu.ops import compositing

        rng = np.random.default_rng(22)
        args = self._make(rng, 1, 4, 3, 16)
        sigma_a, rgb_a, depth_a, sigma_b, rgb_b, depth_b, dirs = map(
            jnp.asarray, args
        )

        def loss_sorted(sa, ra, sb, rb):
            o = self._sorted_reference(
                sa, ra, depth_a, sb, rb, depth_b, dirs, True
            )
            return (
                jnp.sum(o.rgb * jnp.cos(o.rgb))
                + jnp.sum(o.mask * 0.7)
                + jnp.sum(o.depth)
            )

        def loss_dual(sa, ra, sb, rb):
            o = compositing.composite_dual(
                sigma_a=sa, depth_a=depth_a, channels_a={"rgb": ra},
                sigma_b=sb, depth_b=depth_b, channels_b={"rgb": rb},
                ray_directions=dirs, white_background=True,
            )
            return (
                jnp.sum(o.rgb * jnp.cos(o.rgb))
                + jnp.sum(o.mask * 0.7)
                + jnp.sum(o.depth)
            )

        g_ref = jax.grad(loss_sorted, argnums=(0, 1, 2, 3))(
            sigma_a, rgb_a, sigma_b, rgb_b
        )
        g_new = jax.grad(loss_dual, argnums=(0, 1, 2, 3))(
            sigma_a, rgb_a, sigma_b, rgb_b
        )
        for r, n in zip(g_ref, g_new):
            np.testing.assert_allclose(
                np.asarray(n), np.asarray(r), rtol=3e-4, atol=3e-5
            )

    def test_render_field_modes_agree(self):
        """Full render_field: merge_mode='pairwise' == 'sort' on a toy
        field (values + latent gradients)."""
        import dataclasses

        from nerf_from_image_tpu.engine import render as render_mod
        from nerf_from_image_tpu.ops import rays as rays_mod
        from nerf_from_image_tpu.ops import aabb

        B, H, W = 1, 8, 8
        cfg = render_mod.RenderConfig(
            resolution=H,
            depth_samples_per_ray=12,
            fine_sampling=True,
            scene_range=1.4,
            white_background=True,
            query_chunk=None,
        )
        pose = jnp.eye(4)[None].at[:, 2, 3].set(3.0)
        focal = jnp.full((B,), 1.2)
        ro, rd = rays_mod.get_ray_bundle(H, W, focal, pose, None, None)
        rd = rays_mod.normalize_directions(rd)
        near, far = aabb.compute_near_far_planes(ro, rd, cfg.scene_range)

        def field_fn_of(theta):
            def field_fn(points, outputs):
                r = jnp.linalg.norm(points, axis=-1)
                sigma = 10.0 * jax.nn.relu(theta[0] - r)
                rgb = jnp.stack(
                    (
                        jnp.sin(points[..., 0] * theta[1]) * 0.5 + 0.5,
                        jnp.cos(points[..., 1]) * 0.5 + 0.5,
                        points[..., 2] * 0.0 + 0.3,
                    ),
                    axis=-1,
                )
                return {"sigma": sigma, "rgb": rgb}

            return field_fn

        theta = jnp.asarray([0.9, 2.0])

        def run(mode, theta):
            c = dataclasses.replace(cfg, merge_mode=mode)
            out, _ = render_mod.render_field(
                c, field_fn_of(theta), ro, rd, near, far, key=None
            )
            return out

        out_s = run("sort", theta)
        out_p = run("pairwise", theta)
        np.testing.assert_allclose(
            np.asarray(out_p.rgb), np.asarray(out_s.rgb), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_p.depth), np.asarray(out_s.depth), rtol=2e-5,
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_p.mask), np.asarray(out_s.mask), rtol=2e-5,
            atol=2e-5,
        )

        def loss(mode):
            def f(theta):
                o = run(mode, theta)
                return jnp.sum(o.rgb**2) + jnp.sum(o.mask)

            return f

        g_s = jax.grad(loss("sort"))(theta)
        g_p = jax.grad(loss("pairwise"))(theta)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_s), rtol=1e-4, atol=1e-5
        )


class TestCompositeDualRandomized:
    def test_render_field_modes_agree_with_random_key(self):
        """Randomized (training-path) render: the fine inverse-CDF draws
        are NOT depth-ordered, so the dual-list compositor must sort its
        fine list (regression: unsorted fine depths silently exploded the
        pairwise path while golden tests only covered key=None)."""
        import dataclasses

        import jax

        from nerf_from_image_tpu.engine import render as render_mod
        from nerf_from_image_tpu.ops import aabb
        from nerf_from_image_tpu.ops import rays as rays_mod

        B, H, W = 1, 8, 8
        cfg = render_mod.RenderConfig(
            resolution=H,
            depth_samples_per_ray=12,
            fine_sampling=True,
            scene_range=1.4,
            white_background=True,
            query_chunk=None,
        )
        pose = jnp.eye(4)[None].at[:, 2, 3].set(3.0)
        focal = jnp.full((B,), 1.2)
        ro, rd = rays_mod.get_ray_bundle(H, W, focal, pose, None, None)
        rd = rays_mod.normalize_directions(rd)
        near, far = aabb.compute_near_far_planes(ro, rd, cfg.scene_range)

        def field_fn(points, outputs):
            r = jnp.linalg.norm(points, axis=-1)
            sigma = 10.0 * jax.nn.relu(0.9 - r)
            rgb = jnp.stack(
                (
                    jnp.sin(points[..., 0] * 2.0) * 0.5 + 0.5,
                    jnp.cos(points[..., 1]) * 0.5 + 0.5,
                    points[..., 2] * 0.0 + 0.3,
                ),
                axis=-1,
            )
            return {"sigma": sigma, "rgb": rgb}

        outs = {}
        for mode in ("sort", "pairwise"):
            c = dataclasses.replace(cfg, merge_mode=mode)
            outs[mode], _ = render_mod.render_field(
                c, field_fn, ro, rd, near, far, key=jax.random.key(5)
            )
        for f in ("rgb", "depth", "mask"):
            np.testing.assert_allclose(
                np.asarray(getattr(outs["pairwise"], f)),
                np.asarray(getattr(outs["sort"], f)),
                rtol=2e-5, atol=2e-5, err_msg=f,
            )
        # Sanity: the mask is a physical accumulation in [0, 1].
        assert float(outs["pairwise"].mask.min()) >= 0.0
        assert float(outs["pairwise"].mask.max()) <= 1.0 + 1e-5


def test_aabb_all_miss_finite():
    """A camera that misses the scene box entirely (PnP dummy pose) must
    still yield finite near/far so the render degrades to an empty image
    instead of NaNs (the reference crashes here)."""
    from nerf_from_image_tpu.ops import aabb

    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 10.0]), (1, 4, 4, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 4, 4, 3))
    near, far = aabb.compute_near_far_planes(o, d, 1.4)
    assert np.isfinite(np.asarray(near)).all()
    assert np.isfinite(np.asarray(far)).all()
    assert float((far - near).min()) > 0


def test_aabb_on_face_parallel_ray_no_nan():
    """Origin exactly on a box face with a perpendicular direction (ortho
    cameras do this) must not produce NaN near/far (regression: 0*inf in
    the slab test poisoned the global miss-fill)."""
    from nerf_from_image_tpu.ops import aabb

    o = jnp.asarray([[[[1.4, 0.0, -3.0]]]])  # x exactly on the +x face
    d = jnp.asarray([[[[0.0, 0.0, 1.0]]]])  # no x component
    near, far = aabb.compute_near_far_planes(o, d, 1.4)
    assert np.isfinite(np.asarray(near)).all()
    assert np.isfinite(np.asarray(far)).all()


def test_perturb_poses_golden():
    """perturb_poses vs the reference (lib/pose_utils.py:171-186): identical
    target distances -> identical nearest-neighbour pose swap. The torch
    generator's rand sequence is replayed and injected via
    `target_distances` (exact RNG parity across frameworks is impossible;
    the selection logic is what's under test)."""
    from tests.conftest import import_reference_module, reference_available

    if not reference_available():
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    ref_pose = import_reference_module("lib.pose_utils")
    from nerf_from_image_tpu.pose.pose import perturb_poses

    rng = np.random.default_rng(7)
    n = 24
    mats = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 2.5])
        mats.append(m)
    poses = np.stack(mats).astype(np.float32)
    focal = (1.0 + rng.random(n)).astype(np.float32)
    avg_angle = 30.0

    ref_out, ref_focal = ref_pose.perturb_poses(
        torch.from_numpy(poses), avg_angle, torch.from_numpy(focal)
    )

    # Replay the reference's torch.Generator(1234) rand draws.
    g = torch.Generator().manual_seed(1234)
    targets = np.array(
        [float(torch.rand((1,), generator=g)) * avg_angle * 2
         for _ in range(n)]
    )
    got, got_focal = perturb_poses(
        poses, avg_angle, focal, target_distances=targets
    )
    np.testing.assert_allclose(got, ref_out.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        got_focal, ref_focal.numpy(), rtol=1e-6, atol=1e-6
    )
