"""Golden tests for the fused-splat triplane backward (ops/pallas/splat).

Runs the Pallas kernel in interpret mode on the CPU mesh; the values and
gradients are compared against the pure-autodiff packed-gather path —
the same contract the on-device golden run checks (scripts/bench_splat.py
exercises the compiled kernel on real TPU hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_from_image_tpu.ops.pallas import splat
from nerf_from_image_tpu.ops.triplane import (
    pack_corners,
    plane_coords,
    sample_packed,
)

B, RES, S = 2, 16, 8
HP, C = 64, 32
N = RES * RES * S


def _coords3(key, scale=1.05):
    # Ray-coherent-ish smooth points plus exact boundary hits: a linear
    # ramp per ray tile with a few points clamped outside the box.
    k1, k2 = jax.random.split(key)
    base = jax.random.uniform(k1, (B, RES, RES, 1, 3), minval=-0.9,
                              maxval=0.9)
    step = jax.random.uniform(k2, (B, RES, RES, 1, 3), minval=-0.02,
                              maxval=0.02)
    s = jnp.arange(S, dtype=jnp.float32).reshape(1, 1, 1, S, 1)
    pts = (base + step * s) * scale
    # exact +-1 boundary points (the near-plane-on-AABB-face case)
    pts = pts.at[:, 0, 0, :, 0].set(1.0).at[:, 0, 1, :, 1].set(-1.0)
    return pts.reshape(B, N, 3)


def _auto(planes, coords3, gw, dt):
    tp = planes.astype(dt) if dt else planes
    packed = pack_corners(tp)
    cs = plane_coords(coords3)
    e = sum(sample_packed(packed[:, k], cs[k]) for k in range(3)) / 3.0
    return jnp.sum(e * gw)


def _op(planes, coords3, gw, dt):
    e = splat.triplane_sample_mean(
        planes, coords3, (RES, RES, S), dt, (8, 8, 4), 16, 16
    )
    return jnp.sum(e * gw)


@pytest.mark.parametrize("dt,tolp,tolc", [
    (None, 5e-5, 5e-5),
    ("bfloat16", 2e-2, 2e-2),
])
def test_triplane_sample_mean_matches_autodiff(dt, tolp, tolc):
    coords3 = _coords3(jax.random.key(0))
    planes = jax.random.normal(jax.random.key(1), (B, 3, HP, HP, C))
    gw = jax.random.normal(jax.random.key(2), (B, N, C))

    va, (gpa, gca) = jax.jit(
        jax.value_and_grad(_auto, argnums=(0, 1)), static_argnums=3
    )(planes, coords3, gw, dt)
    vo, (gpo, gco) = jax.jit(
        jax.value_and_grad(_op, argnums=(0, 1)), static_argnums=3
    )(planes, coords3, gw, dt)

    assert np.isfinite(float(vo))
    np.testing.assert_allclose(float(vo), float(va), rtol=1e-5)
    ep = float(jnp.max(jnp.abs(gpa - gpo)) / jnp.max(jnp.abs(gpa)))
    ec = float(jnp.max(jnp.abs(gca - gco)) / jnp.max(jnp.abs(gca)))
    assert ep < tolp, f"plane grad mismatch {ep}"
    assert ec < tolc, f"coord grad mismatch {ec}"


def test_misfit_blocks_route_through_residual_scatter():
    # Scatter a few blocks' coords across the whole plane so their
    # footprint overflows the window; values must still be exact.
    coords3 = _coords3(jax.random.key(3))
    wild = jax.random.uniform(
        jax.random.key(4), (B, 8 * 8 * 4, 3), minval=-1.0, maxval=1.0
    )
    coords3 = coords3.at[:, : 8 * 8 * 4].set(wild)
    planes = jax.random.normal(jax.random.key(5), (B, 3, HP, HP, C))
    gw = jax.random.normal(jax.random.key(6), (B, N, C))
    ga = jax.jit(jax.grad(_auto, argnums=0), static_argnums=3)(
        planes, coords3, gw, None
    )
    go = jax.jit(jax.grad(_op, argnums=0), static_argnums=3)(
        planes, coords3, gw, None
    )
    ep = float(jnp.max(jnp.abs(ga - go)) / jnp.max(jnp.abs(ga)))
    assert ep < 5e-5, ep


def test_full_fallback_when_budget_exceeded():
    # Fully random coords: most blocks overflow -> lax.cond slow branch.
    coords3 = jax.random.uniform(
        jax.random.key(7), (B, N, 3), minval=-1.0, maxval=1.0
    )
    planes = jax.random.normal(jax.random.key(8), (B, 3, HP, HP, C))
    gw = jax.random.normal(jax.random.key(9), (B, N, C))
    ga = jax.jit(jax.grad(_auto, argnums=0), static_argnums=3)(
        planes, coords3, gw, None
    )
    go = jax.jit(jax.grad(_op, argnums=0), static_argnums=3)(
        planes, coords3, gw, None
    )
    ep = float(jnp.max(jnp.abs(ga - go)) / jnp.max(jnp.abs(ga)))
    assert ep < 5e-5, ep


# On the comparison geometry of the render-level tests below: the AABB in
# the RenderConfig is pulled 1e-4 INSIDE the generator's box (config
# scene_range 1.4*(1-1e-4) vs model 1.4). With equal ranges, every ray's
# first sample lies exactly ON an AABB face, i.e. exactly on the clip
# boundary of the plane-coordinate saturation — a kink where the
# subgradient is convention-dependent (JAX's balanced_eq gives 0.5 at an
# EXACT tie, 0 or 1 one ulp either side). The splat program and the
# reference program are compiled independently; XLA:CPU's fusion places
# those knife-edge points one ulp apart between the two programs, so
# their tie sets differ and face-sample coordinate gradients legitimately
# diverge by the tie swing (measured +-1e-2 of the pose grad by edge-
# convention bracketing; on real TPU the two programs agree at ~2e-7
# even at exact-face geometry). Pulling the AABB inside the box removes
# the kink from the comparison and the gradients must then match tightly;
# a separate loose assertion keeps exact-face geometry covered against
# gross breakage.
_SR_INNER = 1.4 * (1.0 - 1e-4)


def _make_render_case():
    from nerf_from_image_tpu.engine.render import render
    from nerf_from_image_tpu.models.generator import Generator

    model = Generator(
        latent_dim=64,
        scene_range=1.4,
        attention_values=4,
        use_sdf=True,
        w_dim=64,
        plane_channels=32,
        synthesis_resolution=64,
        channel_base=2048,
        channel_max=64,
    )
    variables = model.init(jax.random.key(0), method="init_all")
    pose = jnp.eye(4)[None].at[:, 2, 3].set(2.5)
    focal = jnp.full((1,), 1.2)

    def loss(ws, pose, cfg):
        out, _ = render(cfg, model, variables, pose, focal, ws)
        return jnp.sum(jnp.square(out.rgb)) + jnp.sum(jnp.square(out.mask))

    return model, loss, pose


def _assert_splat_matches_ref(cfg, ws_key, tol_inner=1e-4, tol_face=2e-2):
    import dataclasses

    model, loss, pose = _make_render_case()
    cfg_ref = dataclasses.replace(cfg, plane_splat=False)
    ws = jax.random.normal(jax.random.key(ws_key), (1, model.num_ws, 64))
    ws = ws * 0.1

    la, ga = jax.value_and_grad(loss, argnums=(0, 1))(ws, pose, cfg)
    lb, gb = jax.value_and_grad(loss, argnums=(0, 1))(ws, pose, cfg_ref)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    tol = tol_inner if cfg.scene_range != 1.4 else tol_face
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        denom = float(jnp.max(jnp.abs(b))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / denom
        assert err < tol, (err, tol, a.shape)


@pytest.mark.parametrize("scene_range", [_SR_INNER, 1.4])
def test_render_with_plane_splat_matches_default_path(scene_range):
    from nerf_from_image_tpu.engine.render import RenderConfig

    cfg = RenderConfig(
        resolution=16,
        depth_samples_per_ray=8,
        fine_sampling=True,
        scene_range=scene_range,
        query_chunk=None,
        plane_splat=True,
        splat_block=(8, 8, 4),
        splat_window=(16, 16),
    )
    _assert_splat_matches_ref(cfg, ws_key=1)


def test_normals_render_through_plane_splat_matches():
    """Demo/eval panels render SDF normals (an inner jax.vjp through the
    field decode — generator.py sample_field); with plane_splat the vjp
    crosses the splat custom_vjp exactly once, which it supports. The
    normal maps must match the non-splat path (demo_driving/eval_driving
    pass --plane_splat into their panel renders)."""
    import dataclasses

    from nerf_from_image_tpu.engine.render import RenderConfig, render

    model, loss, pose = _make_render_case()
    variables = model.init(jax.random.key(0), method="init_all")
    focal = jnp.full((1,), 1.2)
    ws = jax.random.normal(jax.random.key(11), (1, model.num_ws, 64)) * 0.1
    cfg = RenderConfig(
        resolution=16, depth_samples_per_ray=8, fine_sampling=True,
        scene_range=_SR_INNER, query_chunk=None, plane_splat=True,
        splat_block=(8, 8, 4), splat_window=(16, 16), compute_normals=True,
    )
    out, _ = jax.jit(lambda v: render(cfg, model, v, pose, focal, ws))(
        variables
    )
    cfg0 = dataclasses.replace(cfg, plane_splat=False)
    out0, _ = jax.jit(lambda v: render(cfg0, model, v, pose, focal, ws))(
        variables
    )
    np.testing.assert_allclose(
        np.asarray(out.normals), np.asarray(out0.normals), atol=1e-4
    )


def test_g_step_with_plane_splat_matches_default_path():
    """Training G-step with the splat backward on its MAIN render.

    Legal first-order territory: path_length differentiates only the
    synthesis map (planes w.r.t. ws — engine/regularizers.py:28-55,
    reference models/generator.py:484-499), and eikonal/TV/entropy decode
    their own stratified volume samples through the double-backward
    grid-sample branch (raw planes — models/generator.py:253-262), so no
    grad-of-grad ever crosses the splat's custom_vjp. Losses and updated
    parameters must match the default scatter path (f32 strict mode,
    knife-edge-free AABB — see the _SR_INNER note above).
    """
    import dataclasses

    from nerf_from_image_tpu.engine import gan
    from tests.test_gan_engine import random_batch, tiny_configs, tiny_models

    model, disc = tiny_models()
    config, rc = tiny_configs()
    rc = dataclasses.replace(
        rc,
        scene_range=rc.scene_range * (1.0 - 1e-4),
        query_chunk=None,
    )
    rc_splat = dataclasses.replace(
        rc, plane_splat=True, splat_block=(8, 8, 4), splat_window=(16, 16)
    )
    state = gan.init_gan_state(config, model, disc, jax.random.key(0), rc)
    batch = random_batch(np.random.default_rng(0), config.batch_size)
    key = jax.random.key(1)

    step = lambda cfg: jax.jit(
        lambda s, b, k: gan.g_step(config, cfg, model, disc, s, b, k)
    )(state, batch, key)
    state_ref, m_ref = step(rc)
    state_spl, m_spl = step(rc_splat)

    for k in sorted(m_ref):
        np.testing.assert_allclose(
            float(m_spl[k]), float(m_ref[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"metric {k}",
        )
    for a, b in zip(
        jax.tree.leaves(state_spl.params_g), jax.tree.leaves(state_ref.params_g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


@pytest.mark.parametrize("scene_range", [_SR_INNER, 1.4])
def test_render_with_chunked_plane_splat_matches_default_path(scene_range):
    """plane_splat under query chunking: a chunk that is a whole number of
    image rows is ray-coherent, so the windowed splat applies per chunk
    (engine/render.py chunk_splat_spec) with jax.checkpoint remat keeping
    the chunked path's memory bound. At knife-edge-free geometry the
    chunked splat matches the chunked reference at ~2e-7 (see the
    _SR_INNER note above for why exact-face geometry only gets the loose
    band on CPU)."""
    from nerf_from_image_tpu.engine.render import RenderConfig

    # 16x16 rays x 8 samples: chunk = 8 rows x 16 x 8 = 1024 points.
    cfg = RenderConfig(
        resolution=16,
        depth_samples_per_ray=8,
        fine_sampling=True,
        scene_range=scene_range,
        query_chunk=1024,
        plane_splat=True,
        splat_block=(8, 8, 4),
        splat_window=(16, 16),
    )
    _assert_splat_matches_ref(cfg, ws_key=2)
