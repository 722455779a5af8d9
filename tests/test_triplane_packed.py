"""Corner-packed triplane sampling == naive bilinear sampling (values and
gradients, in-range and out-of-range coordinates)."""

import numpy as np

import jax
import jax.numpy as jnp

from nerf_from_image_tpu.ops.grid_sample import grid_sample_2d
from nerf_from_image_tpu.ops.triplane import pack_corners, sample_packed


def test_values_match_grid_sample():
    rng = np.random.default_rng(0)
    B, H, W, C, N = 2, 17, 23, 8, 301
    plane = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((B, N, 2)) * 2.6 - 1.3).astype(np.float32)
    )
    want = grid_sample_2d(plane, coords)
    got = sample_packed(pack_corners(plane), coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_gradients_match():
    rng = np.random.default_rng(1)
    B, H, W, C, N = 1, 9, 9, 4, 64
    plane = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    # Interior coords only: at the exact border the clamp subgradient may
    # legitimately differ (measure-zero set).
    coords = jnp.asarray(
        (rng.random((B, N, 2)) * 1.8 - 0.9).astype(np.float32)
    )
    cot = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))

    def loss_legacy(p, c):
        return jnp.sum(grid_sample_2d(p, c) * cot)

    def loss_packed(p, c):
        return jnp.sum(sample_packed(pack_corners(p), c) * cot)

    g1 = jax.grad(loss_legacy, argnums=(0, 1))(plane, coords)
    g2 = jax.grad(loss_packed, argnums=(0, 1))(plane, coords)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               rtol=1e-4, atol=1e-5)


def test_double_backward():
    rng = np.random.default_rng(2)
    plane = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    packed = pack_corners(plane)
    coords = jnp.asarray((rng.random((1, 5, 2)) - 0.5).astype(np.float32))

    def f(c):
        return sample_packed(packed, c).sum()

    g = jax.grad(lambda c: jnp.square(jax.grad(f)(c)).sum())(coords)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_rows_close_to_f32():
    """bf16 packed tables (RenderConfig.plane_dtype) sample within bf16
    quantization error of the f32 path, and gradients flow."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_from_image_tpu.ops.triplane import pack_corners, sample_packed

    rng = np.random.default_rng(5)
    plane = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((2, 64, 2)) * 2 - 1).astype(np.float32)
    )

    out32 = sample_packed(pack_corners(plane), coords)
    out16 = sample_packed(pack_corners(plane.astype(jnp.bfloat16)), coords)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0, atol=2e-2
    )

    g = jax.grad(
        lambda p: jnp.sum(
            sample_packed(pack_corners(p.astype(jnp.bfloat16)), coords) ** 2
        )
    )(plane)
    assert g.dtype == jnp.float32
    assert bool(jnp.any(g != 0))
