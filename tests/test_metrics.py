"""Tests for on-device metrics: PSNR/SSIM/IoU and FID (Newton–Schulz sqrtm
vs scipy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nerf_from_image_tpu.metrics import fid as fid_mod
from nerf_from_image_tpu.metrics import image as im_mod


class TestPSNR:
    def test_matches_manual(self):
        rng = np.random.default_rng(0)
        a = rng.random((4, 16, 16, 3)).astype(np.float32)
        b = rng.random((4, 16, 16, 3)).astype(np.float32)
        want = -10 * np.log10(((a - b) ** 2).mean(axis=(1, 2, 3)))
        got = im_mod.psnr(jnp.asarray(a), jnp.asarray(b), reduction="none")
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_clamps_at_60(self):
        a = np.zeros((1, 8, 8, 3), np.float32)
        got = im_mod.psnr(jnp.asarray(a), jnp.asarray(a))
        assert float(got) == 60.0

    def test_masked(self):
        rng = np.random.default_rng(1)
        a = rng.random((2, 8, 8, 3)).astype(np.float32)
        b = rng.random((2, 8, 8, 3)).astype(np.float32)
        mask = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
        sel = mask[..., None] > 0
        sel3 = np.broadcast_to(sel, a.shape)
        want = -10 * np.log10(((a[sel3] - b[sel3]) ** 2).mean())
        got = im_mod.psnr(jnp.asarray(a), jnp.asarray(b), mask=jnp.asarray(mask))
        np.testing.assert_allclose(float(got), want, rtol=1e-5)


def _ssim_direct(x, y, win=7, data_range=1.0):
    """Slow direct sliding-window SSIM (independent oracle, skimage defaults)."""
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    H, W = x.shape
    r = win // 2
    vals = []
    for i in range(r, H - r):
        for j in range(r, W - r):
            px = x[i - r : i + r + 1, j - r : j + r + 1].ravel()
            py = y[i - r : i + r + 1, j - r : j + r + 1].ravel()
            ux, uy = px.mean(), py.mean()
            vx = px.var(ddof=1)
            vy = py.var(ddof=1)
            vxy = ((px - ux) * (py - uy)).sum() / (win * win - 1)
            vals.append(
                ((2 * ux * uy + c1) * (2 * vxy + c2))
                / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
            )
    return np.mean(vals)


class TestSSIM:
    def test_identity(self):
        rng = np.random.default_rng(2)
        a = rng.random((2, 16, 16, 3)).astype(np.float32)
        got = im_mod.ssim(jnp.asarray(a), jnp.asarray(a))
        np.testing.assert_allclose(float(got), 1.0, atol=1e-5)

    def test_matches_direct(self):
        rng = np.random.default_rng(3)
        a = rng.random((1, 20, 20, 1)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
        want = _ssim_direct(a[0, :, :, 0].astype(np.float64),
                            b[0, :, :, 0].astype(np.float64))
        got = im_mod.ssim(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


class TestIoU:
    def test_matches_manual(self):
        rng = np.random.default_rng(4)
        a = rng.random((3, 12, 12)).astype(np.float32)
        b = rng.random((3, 12, 12)).astype(np.float32)
        pa, pb = a > 0.5, b > 0.5
        inter = (pa & pb).sum(axis=(-2, -1))
        union = (pa | pb).sum(axis=(-2, -1))
        want = (inter + 1e-6) / (union + 1e-6)
        got = im_mod.iou(jnp.asarray(a), jnp.asarray(b), reduction="none")
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


class TestFID:
    def test_sqrtm_vs_scipy(self):
        from scipy import linalg

        rng = np.random.default_rng(5)
        x = rng.standard_normal((64, 32))
        a = (x.T @ x / 64).astype(np.float32) + 0.01 * np.eye(32, dtype=np.float32)
        want = linalg.sqrtm(a.astype(np.float64)).real
        got = np.asarray(fid_mod.sqrtm_newton_schulz(jnp.asarray(a), 40))
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)

    def test_frechet_vs_scipy(self):
        from scipy import linalg

        rng = np.random.default_rng(6)
        d = 24
        act1 = rng.standard_normal((500, d)).astype(np.float32)
        act2 = (rng.standard_normal((400, d)) * 1.3 + 0.2).astype(np.float32)
        mu1, s1 = act1.mean(0), np.cov(act1, rowvar=False)
        mu2, s2 = act2.mean(0), np.cov(act2, rowvar=False)
        covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
        want = (
            ((mu1 - mu2) ** 2).sum()
            + np.trace(s1)
            + np.trace(s2)
            - 2 * np.trace(covmean.real)
        )

        jmu1, js1 = fid_mod.calculate_stats(jnp.asarray(act1))
        jmu2, js2 = fid_mod.calculate_stats(jnp.asarray(act2))
        np.testing.assert_allclose(np.asarray(js1), s1, rtol=1e-4, atol=1e-5)
        got = float(fid_mod.frechet_distance(jmu1, js1, jmu2, js2))
        np.testing.assert_allclose(got, want, rtol=1e-2)


class TestMesh:
    def test_mesh_and_sharding(self):
        import jax

        from nerf_from_image_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh()
        assert mesh.devices.size == jax.device_count()
        batch = {"x": jnp.zeros((16, 4, 4, 3)), "y": None}
        placed = mesh_mod.shard_batch(mesh, batch)
        assert placed["y"] is None
        assert placed["x"].sharding.spec == jax.sharding.PartitionSpec(
            "data", None, None, None
        )

        params = {"w": jnp.zeros((8, 8))}
        rep = mesh_mod.replicate(mesh, params)
        assert rep["w"].sharding.is_fully_replicated


class TestLPIPSWeightInterop:
    """Value-level test of lpips_state_to_variables: a torch VGG16-features
    trunk with random weights is exported in the lpips package's key format
    ('features.N.weight' + 'lin{i}.model.1.weight'), loaded into the flax
    tree, and the full LPIPS distance is compared against a torch oracle
    implementing the lpips formula (scaling layer, channel-unit-normalized
    taps, non-negative 1x1 lin heads, spatial mean — reference:
    lib/metrics.py:106-146 wraps lpips.LPIPS(net='vgg'))."""

    def test_distance_matches_torch_oracle(self):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        import torch.nn.functional as F

        import jax
        import jax.numpy as jnp

        from nerf_from_image_tpu.models.lpips import (
            LPIPS,
            lpips_state_to_variables,
        )

        torch.manual_seed(0)
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        layers = []
        in_ch = 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(tnn.ReLU())
                in_ch = v
        features = tnn.Sequential(*layers)
        for m in features:
            if isinstance(m, tnn.Conv2d):
                tnn.init.normal_(m.weight, std=0.2)
                tnn.init.normal_(m.bias, std=0.1)

        lin_chans = [64, 128, 256, 512, 512]
        lins = [torch.rand(c) * 0.1 for c in lin_chans]

        # Export in the lpips package's key layout.
        state = {}
        for name, t in features.state_dict().items():
            state[f"features.{name}"] = t.detach().numpy()
        for i, w in enumerate(lins):
            state[f"lin{i}.model.1.weight"] = (
                w.reshape(1, -1, 1, 1).numpy()
            )

        model = LPIPS()
        rng = np.random.default_rng(1)
        x0 = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
        x1 = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
        variables = model.init(
            jax.random.key(0), jnp.asarray(x0), jnp.asarray(x1)
        )
        variables = jax.tree.map(
            jnp.asarray, lpips_state_to_variables(dict(variables), state)
        )
        got = np.asarray(
            model.apply(variables, jnp.asarray(x0), jnp.asarray(x1))
        )

        # Torch oracle.
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def taps(im):
            x = (torch.from_numpy(
                np.transpose(im, (0, 3, 1, 2))
            ) - shift) / scale
            outs = []
            relu_count = 0
            per_stage = [2, 2, 3, 3, 3]
            stage = 0
            for m in features:
                x = m(x)
                if isinstance(m, tnn.ReLU):
                    relu_count += 1
                    if relu_count == per_stage[stage]:
                        outs.append(x)
                        relu_count = 0
                        stage += 1
            return outs

        def normalize(t, eps=1e-10):
            n = torch.sqrt(torch.sum(t**2, dim=1, keepdim=True))
            return t / (n + eps)

        with torch.no_grad():
            f0 = [normalize(t) for t in taps(x0)]
            f1 = [normalize(t) for t in taps(x1)]
            total = 0.0
            for i, (a, b) in enumerate(zip(f0, f1)):
                w = torch.clamp(lins[i], min=0.0).view(1, -1, 1, 1)
                d = ((a - b) ** 2 * w).sum(dim=1)
                total = total + d.mean(dim=(1, 2))
            ref = total[:, None].numpy()

        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-5)
