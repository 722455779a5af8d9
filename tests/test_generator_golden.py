"""Golden tests: generator (mapping/synthesis/field) and full render vs the
PyTorch reference with transferred weights.

The torch reference modules are randomly initialized, their state dict is
converted into our flax variable tree (utils/torch_interop), and outputs plus
input gradients are compared in strict fp32. The full-render oracle composes
the reference's own library functions exactly the way run.py:176-350 does
(deterministic sampling, noise off).
"""

import flax
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import import_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")


RES = 32  # render resolution for the full-render tests (CPU-friendly)
SAMPLES = 16


def build_pair(attention_values=0, use_viewdir=False, latent_dim=512,
               scene_range=0.55, seed=0):
    """Returns (torch generator, flax generator, flax variables)."""
    ref_generator = import_reference_module("models.generator")
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.utils import torch_interop

    torch.manual_seed(seed)
    tg = ref_generator.Generator(
        latent_dim,
        scene_range,
        attention_values=attention_values,
        use_viewdir=use_viewdir,
        use_encoder=False,
        disable_stylegan_noise=True,
        use_sdf=True,
        num_classes=None,
    )
    tg.eval()

    jg = Generator(
        latent_dim=latent_dim,
        scene_range=scene_range,
        attention_values=attention_values,
        use_viewdir=use_viewdir,
        use_sdf=True,
    )
    variables = jg.init(jax.random.key(0), method="init_all")
    sd = torch_interop.torch_module_state_to_numpy(tg)
    variables = torch_interop.state_dict_to_variables(
        flax.core.unfreeze(variables), sd
    )
    variables = jax.tree.map(jnp.asarray, variables)
    return tg, jg, variables


@pytest.fixture(scope="module")
def pair_plain():
    return build_pair(attention_values=0, scene_range=0.55, seed=0)


@pytest.fixture(scope="module")
def pair_attention():
    return build_pair(attention_values=10, scene_range=1.4, seed=1)


def test_mapping_matches(pair_plain):
    tg, jg, variables = pair_plain
    rng = np.random.default_rng(0)
    z = rng.standard_normal((4, 512)).astype(np.float32)
    with torch.no_grad():
        ref = tg.mapping_network(torch.from_numpy(z)).numpy()
    got = jg.apply(variables, jnp.asarray(z), method="mapping")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_synthesis_matches(pair_plain):
    tg, jg, variables = pair_plain
    rng = np.random.default_rng(1)
    ws = rng.standard_normal((1, 14, 512)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tg.synthesis_network(torch.from_numpy(ws)).numpy()
    ref_planes = ref.reshape(1, 3, 32, 256, 256)
    got = jg.apply(variables, jnp.asarray(ws), method="synthesize")
    got_nchw = np.transpose(np.asarray(got), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got_nchw, ref_planes, rtol=2e-3, atol=1e-4)


def _torch_sampler(tg, ws, points, requests):
    with torch.no_grad():
        outs = tg(None, torch.from_numpy(ws), request_model_outputs=["sampler"])
        return outs["sampler"](torch.from_numpy(points), requests)


def _jax_field(jg, variables, ws, points, outputs):
    ws_j = jnp.asarray(ws)
    planes = jg.apply(variables, ws_j, method="synthesize")
    attn = (
        jg.apply(variables, ws_j, method="texture")
        if jg.attention_values > 0
        else None
    )
    return jg.apply(
        variables,
        planes,
        jnp.asarray(points.reshape(points.shape[0], -1, 3)),
        attention_values=attn,
        outputs=outputs,
        method="sample_field",
    )


@pytest.mark.parametrize("pair_name", ["pair_plain", "pair_attention"])
def test_field_sigma_rgb(pair_name, request):
    tg, jg, variables = request.getfixturevalue(pair_name)
    rng = np.random.default_rng(2)
    B, N = 1, 257
    ws = rng.standard_normal((B, jg.num_ws, 512)).astype(np.float32) * 0.1
    pts = (rng.random((B, N, 1, 3)).astype(np.float32) * 2.4 - 1.2) * (
        jg.scene_range
    )

    requests = ["sigma", "rgb"]
    ref = _torch_sampler(tg, ws, pts, requests)
    got = _jax_field(jg, variables, ws, pts, ("sigma", "rgb"))

    np.testing.assert_allclose(
        np.asarray(got["sigma"]).reshape(-1),
        ref["sigma"].numpy().reshape(-1),
        rtol=1e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]).reshape(-1),
        ref["rgb"].numpy().reshape(-1),
        rtol=1e-3,
        atol=1e-4,
    )


def test_field_semantics_and_distance(pair_attention):
    tg, jg, variables = pair_attention
    rng = np.random.default_rng(3)
    ws = rng.standard_normal((1, 15, 512)).astype(np.float32) * 0.1
    pts = (rng.random((1, 64, 1, 3)).astype(np.float32) * 2 - 1) * 1.4

    ref = _torch_sampler(tg, ws, pts, ["sigma", "rgb", "semantics",
                                       "sdf_distance"])
    got = _jax_field(
        jg, variables, ws, pts, ("sigma", "rgb", "semantics", "sdf_distance")
    )
    np.testing.assert_allclose(
        np.asarray(got["semantics"]).reshape(-1),
        ref["semantics"].numpy().reshape(-1),
        rtol=1e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["sdf_distance"]).reshape(-1),
        ref["sdf_distance"].numpy().reshape(-1),
        rtol=1e-3,
        atol=1e-4,
    )


def _reference_render(tg, ref_nerf_utils, pose, focal, ws, scene_range,
                      white_background, res=RES, samples=SAMPLES,
                      requires_grad=False):
    """Oracle: composes the reference library calls exactly as run.py:176-350
    (deterministic; fine sampling on)."""
    import torch.nn.functional as F

    pose_t = torch.from_numpy(pose)
    focal_t = torch.from_numpy(focal) if focal is not None else None
    ws_t = torch.from_numpy(ws)
    if requires_grad:
        pose_t.requires_grad_()
        ws_t.requires_grad_()

    ro, rd = ref_nerf_utils.get_ray_bundle(res, res, focal_t, pose_t, None, None)
    rd = F.normalize(rd, dim=-1)
    with torch.no_grad():
        near, far = ref_nerf_utils.compute_near_far_planes(
            ro.detach(), rd.detach(), scene_range
        )
    qp, dv = ref_nerf_utils.compute_query_points_from_rays(
        ro, rd, near, far, samples, randomize=False
    )
    outs = tg(None, ws_t, request_model_outputs=["sampler"])
    sampler = outs["sampler"]
    co = sampler(qp, ["sigma", "rgb"])
    sigma = co["sigma"].view(*qp.shape[:-1], -1)
    rgb = co["rgb"].view(*qp.shape[:-1], -1)

    z_vals = dv
    with torch.no_grad():
        weights = ref_nerf_utils.render_volume_density_weights_only(
            sigma.squeeze(-1), ro, rd, dv
        ).flatten(0, 2)
        weights = F.max_pool1d(weights.unsqueeze(1).float(), 2, 1, padding=1)
        weights = F.avg_pool1d(weights, 2, 1).squeeze()
        weights = weights + 0.01
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = ref_nerf_utils.sample_pdf(
            z_mid.flatten(0, 2), weights[..., 1:-1], samples, deterministic=True
        )
        z_samples = z_samples.view(*z_vals.shape[:3], z_samples.shape[-1])

    z_sorted, z_idx = torch.sort(torch.cat((z_vals, z_samples), dim=-1), dim=-1)
    qp_fine = ro[..., None, :] + rd[..., None, :] * z_samples[..., :, None]
    fo = sampler(qp_fine, ["sigma", "rgb"])
    sigma_f = fo["sigma"].view(*qp_fine.shape[:-1], -1)
    rgb_f = fo["rgb"].view(*qp_fine.shape[:-1], -1)

    sigma = torch.cat((sigma, sigma_f), dim=-2).gather(
        -2, z_idx.unsqueeze(-1).expand(-1, -1, -1, -1, sigma.shape[-1])
    )
    rgb = torch.cat((rgb, rgb_f), dim=-2).gather(
        -2, z_idx.unsqueeze(-1).expand(-1, -1, -1, -1, rgb.shape[-1])
    )
    rgb_map, depth_map, mask, _, _ = ref_nerf_utils.render_volume_density(
        sigma.squeeze(-1), rgb, ro, rd, z_sorted, None, None,
        white_background=white_background,
    )
    return rgb_map, depth_map, mask, pose_t, ws_t


def _random_pose(rng, batch):
    mats = []
    for _ in range(batch):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
        mats.append(m)
    return np.stack(mats).astype(np.float32)


@pytest.mark.parametrize(
    "pair_name,white", [("pair_plain", True), ("pair_attention", False)]
)
def test_full_render_matches(pair_name, white, request):
    tg, jg, variables = request.getfixturevalue(pair_name)
    ref_nerf_utils = import_reference_module("lib.nerf_utils")
    from nerf_from_image_tpu.engine import render as render_mod

    rng = np.random.default_rng(10)
    pose = _random_pose(rng, 1)
    focal = np.asarray([1.2], np.float32)
    ws = rng.standard_normal((1, jg.num_ws, 512)).astype(np.float32) * 0.1

    ref_rgb, ref_depth, ref_mask, _, _ = _reference_render(
        tg, ref_nerf_utils, pose, focal, ws, jg.scene_range, white
    )

    config = render_mod.RenderConfig(
        resolution=RES,
        depth_samples_per_ray=SAMPLES,
        fine_sampling=True,
        scene_range=jg.scene_range,
        white_background=white,
    )
    out, _ = render_mod.render(
        config, jg, variables, jnp.asarray(pose), jnp.asarray(focal),
        jnp.asarray(ws),
    )
    np.testing.assert_allclose(
        np.asarray(out.rgb), ref_rgb.detach().numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), ref_depth.detach().numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.mask), ref_mask.detach().numpy(), rtol=1e-3, atol=2e-3
    )


def test_full_render_gradients_match(pair_plain):
    """d(pixel loss)/d(ws) and d(pixel loss)/d(cam2world) vs reference."""
    tg, jg, variables = pair_plain
    ref_nerf_utils = import_reference_module("lib.nerf_utils")
    from nerf_from_image_tpu.engine import render as render_mod

    rng = np.random.default_rng(11)
    pose = _random_pose(rng, 1)
    focal = np.asarray([1.2], np.float32)
    ws = rng.standard_normal((1, jg.num_ws, 512)).astype(np.float32) * 0.1

    ref_rgb, _, ref_mask, pose_t, ws_t = _reference_render(
        tg, ref_nerf_utils, pose, focal, ws, jg.scene_range, True,
        requires_grad=True,
    )
    (ref_rgb.square().sum() + ref_mask.square().sum()).backward()

    config = render_mod.RenderConfig(
        resolution=RES,
        depth_samples_per_ray=SAMPLES,
        fine_sampling=True,
        scene_range=jg.scene_range,
        white_background=True,
    )

    def loss_fn(pose_j, ws_j):
        out, _ = render_mod.render(
            config, jg, variables, pose_j, jnp.asarray(focal), ws_j
        )
        return jnp.square(out.rgb).sum() + jnp.square(out.mask).sum()

    g_pose, g_ws = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(pose), jnp.asarray(ws)
    )
    ref_gp = pose_t.grad.numpy()
    ref_gw = ws_t.grad.numpy()
    scale_p = np.maximum(np.abs(ref_gp).max(), 1e-3)
    scale_w = np.maximum(np.abs(ref_gw).max(), 1e-3)
    np.testing.assert_allclose(
        np.asarray(g_pose) / scale_p, ref_gp / scale_p, rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(g_ws) / scale_w, ref_gw / scale_w, rtol=5e-3, atol=5e-3
    )
