"""Measures the Pallas windowed splat vs the XLA scatter-add backward.

1. Correctness: splat_blocks vs xla_scatter_splat on window-fitting blocks.
2. Footprint stats: fraction of ray-coherent blocks whose plane footprint
   fits a [WY, WX] window at REAL bench geometry (bench.py cameras).
3. Perf: kernel wall-clock at bench shapes vs the scatter baseline.

Run: python scripts/bench_splat.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from timing import timeit

from nerf_from_image_tpu.ops import aabb, rays, sampling
from nerf_from_image_tpu.ops.pallas import splat
from nerf_from_image_tpu.ops.triplane import plane_coords

B, RES, S = 4, 128, 64
H = W = 256
C = 32
SCENE_RANGE = 1.4


def bench_points(B=B, RES=RES, S=S):
    """Query points at bench.py's exact camera distribution."""
    rng = np.random.default_rng(0)
    mats = []
    for _ in range(B):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
        mats.append(m)
    pose = jnp.asarray(np.stack(mats).astype(np.float32))
    focal = jnp.full((B,), 1.2)

    ro, rd = rays.get_ray_bundle(RES, RES, focal, pose)  # noqa
    rd = rays.normalize_directions(rd)
    near, far = aabb.compute_near_far_planes(ro, rd, SCENE_RANGE)
    pts, _ = sampling.compute_query_points_from_rays(
        ro, rd, near, far, S, key=None
    )
    return pts.reshape(B, -1, 3) / SCENE_RANGE


def footprint_stats(coords3):
    print("== footprint stats (bench geometry) ==")
    planes = plane_coords(coords3)
    for bs in [(8, 8, 8), (8, 8, 16), (16, 16, 8), (16, 16, 4), (4, 4, 32)]:
        for WY, WX in [(64, 64), (128, 64), (128, 128)]:
            worst = 1.0
            for pi, c2 in enumerate(planes):
                ix, iy = splat.pixel_coords(c2, H, W)
                ixb = splat.to_blocks(ix.reshape(B, RES, RES, S), bs)
                iyb = splat.to_blocks(iy.reshape(B, RES, RES, S), bs)
                x0 = jnp.minimum(jnp.floor(ixb), W - 2.0)
                y0 = jnp.minimum(jnp.floor(iyb), H - 2.0)
                xs = jnp.max(x0, 1) - (
                    jnp.min(x0, 1) - jnp.min(x0, 1) % 4
                )
                ys = jnp.max(y0, 1) - (
                    jnp.min(y0, 1) - jnp.min(y0, 1) % 8
                )
                fit = jnp.mean(
                    ((xs + 1 <= WX - 1) & (ys + 1 <= WY - 1)).astype(
                        jnp.float32
                    )
                )
                worst = min(worst, float(fit))
            print(
                f"  block {bs} window ({WY},{WX}): "
                f"worst-plane fit fraction {worst:.4f}"
            )


def correctness(coords3=None):
    print("== correctness (kernel vs scatter, f32 and bf16) ==")
    # Reduced scale: the exact-f32 scatter reference materializes padded
    # [B, N, C] f32 temps that OOM at full bench shapes.
    cB, cRES, cS = 2, 64, 64
    coords3 = bench_points(cB, cRES, cS)
    key = jax.random.key(7)
    g = jax.random.normal(key, (cB, cRES * cRES * cS, C), jnp.float32)

    def ref_fn(c2, g):
        ix, iy = splat.pixel_coords(c2, H, W)
        return splat.xla_scatter_splat(ix, iy, g, H=H, W=W)

    jref = jax.jit(ref_fn)
    refs = [jref(c2, g) for c2 in plane_coords(coords3)]

    def splat_fn(coords3, g, dt):
        return splat.triplane_splat_grads(
            coords3,
            g,
            H=H,
            W=W,
            block_shape=(8, 8, 4),
            img_shape=(cRES, cRES, cS),
            WY=128,
            WX=64,
            compute_dtype=dt,
        )

    for dt, tol in ((jnp.float32, 2e-4), (jnp.bfloat16, 0.02)):
        outs = jax.jit(splat_fn, static_argnums=2)(coords3, g, dt)
        for p in range(3):
            ref_n = np.asarray(refs[p])
            out_n = np.asarray(outs[p])
            denom = np.abs(ref_n).max()
            err = np.abs(out_n - ref_n).max() / denom
            print(f"  dtype {dt.__name__} plane {p}: rel max err {err:.3e}"
                  f" (tol {tol})")
            assert err < tol, err


def perf(coords3):
    print("== perf at bench shapes ==")
    N = RES * RES * S
    rng = np.random.default_rng(1)
    g32 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))

    # scatter baseline: today's packed-row scatter cost proxy (one plane,
    # one pass): 4.2M x [128] rows.
    idx = jnp.asarray(
        rng.integers(0, B * H * W, size=(B * N,)).astype(np.int32)
    )
    upd = jnp.asarray(
        rng.standard_normal((B * N, 4 * C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def scatter(upd, idx):
        return jnp.zeros((B * H * W, 4 * C), jnp.bfloat16).at[idx].add(upd)

    t = timeit(jax.jit(scatter), upd, idx, iters=4)
    print(f"  XLA packed scatter (1 plane-pass): {t*1e3:8.2f} ms")

    def splat_fn(coords3, g, bs, WY, WX, dt):
        return splat.triplane_splat_grads(
            coords3,
            g,
            H=H,
            W=W,
            block_shape=bs,
            img_shape=(RES, RES, S),
            WY=WY,
            WX=WX,
            compute_dtype=dt,
        )

    jfn = jax.jit(splat_fn, static_argnums=(2, 3, 4, 5))
    for bs in [(16, 16, 4), (8, 8, 4), (32, 32, 4)]:
        for WY, WX in [(64, 64), (128, 64), (64, 48)]:
            try:
                t = timeit(jfn, coords3, g32, bs, WY, WX, jnp.bfloat16,
                           iters=4)
                print(
                    f"  splat3 block {bs} win ({WY},{WX}): {t*1e3:8.2f} ms"
                    f"  ({t/3*1e3:.2f}/plane-pass)"
                )
            except Exception as e:
                msg = str(e).split("\n")[0][:140]
                print(f"  splat3 block {bs} win ({WY},{WX}): FAIL {msg}")


def main():
    coords3 = bench_points()
    oob = float(jnp.mean(jnp.any(jnp.abs(coords3) > 1.0, -1).astype(
        jnp.float32)))
    print(f"points out-of-box fraction: {oob:.3f}")
    footprint_stats(coords3)
    correctness()
    perf(coords3)


if __name__ == "__main__":
    main()
