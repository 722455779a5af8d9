"""Compares triplane-decoder formulations at query-chunk granularity.

The OOM dump from an unchunked backward showed [N, 32] f32 intermediates
tiled T(8,128): the 32-lane minor dim pads 4x in HBM. Variants:

  current — per-plane corner FMA -> [N,32] x3 -> sum -> MLP
  fused   — one 12-term FMA -> single [N,32] -> MLP
  scaled  — scale rows by corner weights (stays [N,128], unpadded),
            concat planes [N,384], one tiled matmul folds corner-sum,
            plane-sum and net_0 into the MXU; no [N,32] tensor exists.

Run: python scripts/profile_decoder.py
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

B, N, C, H = 4, 131072, 32, 64
CHUNKS_PER_STEP = 64 * 2  # 64+64 samples at 128^2 over 131072-pt chunks


def corner_weights(packed_hw, coords):
    Hp, Wp = packed_hw
    ix = jnp.clip((coords[..., 0] + 1.0) * 0.5 * (Wp - 1), 0.0, Wp - 1.0)
    iy = jnp.clip((coords[..., 1] + 1.0) * 0.5 * (Hp - 1), 0.0, Hp - 1.0)
    x0f = jnp.minimum(jnp.floor(ix), Wp - 2)
    y0f = jnp.minimum(jnp.floor(iy), Hp - 2)
    wx1, wy1 = ix - x0f, iy - y0f
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    idx = y0f.astype(jnp.int32) * Wp + x0f.astype(jnp.int32)
    return idx, (wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1)


def gather_rows(flat, idx, bofs, dtype):
    rows = jnp.take(flat, (idx + bofs).reshape(-1), axis=0, mode="clip")
    return rows.astype(dtype).reshape(B, N, 4 * C)


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.standard_normal((B, 3, 256, 256, 4 * C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    pts = jnp.asarray((rng.random((B, N, 3)) * 2 - 1).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, 33)).astype(np.float32) * 0.1)
    bofs = (jnp.arange(B, dtype=jnp.int32) * (256 * 256))[:, None]
    flats = [packed[:, p].reshape(B * 256 * 256, 4 * C) for p in range(3)]

    def plane_cs(p):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        return (jnp.stack((x, y), -1), jnp.stack((x, z), -1),
                jnp.stack((y, z), -1))

    def mlp(x):
        return jax.nn.softplus(x @ w1) @ w2

    def current(pts):
        feats = []
        for p, cs in enumerate(plane_cs(pts)):
            idx, (w00, w01, w10, w11) = corner_weights((256, 256), cs)
            r = gather_rows(flats[p], idx, bofs, jnp.float32)
            feats.append(
                r[..., :C] * w00[..., None]
                + r[..., C:2 * C] * w01[..., None]
                + r[..., 2 * C:3 * C] * w10[..., None]
                + r[..., 3 * C:] * w11[..., None]
            )
        return mlp((feats[0] + feats[1] + feats[2]) / 3.0)

    def fused(pts):
        acc = 0.0
        for p, cs in enumerate(plane_cs(pts)):
            idx, (w00, w01, w10, w11) = corner_weights((256, 256), cs)
            r = gather_rows(flats[p], idx, bofs, jnp.float32)
            acc = (
                acc
                + r[..., :C] * w00[..., None]
                + r[..., C:2 * C] * w01[..., None]
                + r[..., 2 * C:3 * C] * w10[..., None]
                + r[..., 3 * C:] * w11[..., None]
            )
        return mlp(acc / 3.0)

    w1_tiled = jnp.concatenate([w1, w1, w1, w1], axis=0)  # [4C, H]

    def scaled(pts):
        out1 = 0.0
        for p, cs in enumerate(plane_cs(pts)):
            idx, (w00, w01, w10, w11) = corner_weights((256, 256), cs)
            r = gather_rows(flats[p], idx, bofs, jnp.float32)
            wrow = jnp.concatenate(
                [
                    jnp.repeat(w[..., None], C, axis=-1)
                    for w in (w00, w01, w10, w11)
                ],
                axis=-1,
            )
            out1 = out1 + (r * wrow) @ w1_tiled
        return jax.nn.softplus(out1 / 3.0) @ w2

    for name, fn in (("current", current), ("fused", fused),
                     ("scaled", scaled)):
        t = timeit(jax.jit(fn), pts)
        loss = lambda q: jnp.sum(fn(q) ** 2)
        tb = timeit(jax.jit(jax.grad(loss)), pts)
        print(f"{name:8s} fwd {t*1e3:7.2f} ms  fwd+bwd {tb*1e3:7.2f} ms "
              f"-> step-equiv {tb*CHUNKS_PER_STEP*1e3:7.0f} ms")

    # value agreement
    a = jax.jit(current)(pts)
    b = jax.jit(fused)(pts)
    c = jax.jit(scaled)(pts)
    print("max |current-fused| :", float(jnp.max(jnp.abs(a - b))))
    print("max |current-scaled|:", float(jnp.max(jnp.abs(a - c))))


if __name__ == "__main__":
    main()
