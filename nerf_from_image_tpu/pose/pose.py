"""Differentiable camera-pose parameterization and pose math.

JAX re-design of the reference pose utilities (reference:
lib/pose_utils.py:20-168). The pose representation optimized during hybrid
inversion is (z0 = log(2f - 1), t2 = screen translation, s = scale,
q = quaternion); `pose_to_matrix` / `matrix_to_pose` convert to/from scaled
cam2world SE(3) matrices (the [3, 3] entry carries the inverse ortho scale).
The fork's fixed orthographic round-trip conventions are preserved (see the
reference comments at lib/pose_utils.py:67-69 and :109-122).

Unlike the reference (which drops to per-matrix NumPy for matrix→quaternion),
everything here is vectorized JAX: matrix_to_quaternion is a branchless
4-candidate select, so pose estimation stays on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def invert_space(mat: jnp.ndarray) -> jnp.ndarray:
    """Converts a scaled view matrix cam2world <-> world2cam.

    mat: [B, 4, 4] with mat[3, 3] holding the inverse scale.
    """
    rot = jnp.swapaxes(mat[:, :3, :3], -2, -1) / mat[:, 3:4, 3:4]
    t = -jnp.sum(mat[:, :3, :3] / mat[:, 3:4, 3:4] * mat[:, :3, None, 3], axis=-2)
    bottom = jnp.zeros_like(mat[:, 3:4, :])
    bottom = bottom.at[:, 0, 3].set(1.0)
    top = jnp.concatenate((rot, t[:, :, None]), axis=-1)
    return jnp.concatenate((top, bottom), axis=-2)


def quaternion_rotate_vector(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotates vectors v [B, N, 3] by unit quaternions q [B, 4] (w, x, y, z)."""
    qvec = jnp.broadcast_to(q[:, None, 1:], v.shape)
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[:, None, :1] * uv + uuv)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [B, 4] -> rotation matrix [B, 3, 3]."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), (q.shape[0], 3, 3))
    return quaternion_rotate_vector(q, eye)


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Scaled 4x4 (or batch of) view matrices -> quaternions [B, 4] (w,x,y,z).

    Vectorized, branchless version of the classic Shepperd selection used by
    the reference (lib/pose_utils.py:78-100), including its handling of the
    scale entry M[3, 3].
    """
    single = m.ndim == 2
    if single:
        m = m[None]
    # The reference extracts in float64 numpy (lib/pose_utils.py:79); here
    # the conversion runs in the input dtype (f32 on TPU) — the golden
    # tests bound the difference, and inversion re-normalizes q each step.

    m00, m01, m02 = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    m10, m11, m12 = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    m20, m21, m22 = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]
    m33 = m[:, 3, 3]

    # Case w: t = trace4 > M33  <=>  trace3 > 0.
    t_w = m00 + m11 + m22 + m33
    q_w = jnp.stack((t_w, m21 - m12, m02 - m20, m10 - m01), axis=-1)

    def diag_case(i, j, k, mii, mjj, mkk, mij, mji, mki, mik, mkj, mjk):
        t = mii - (mjj + mkk) + m33
        comp = [None, None, None, None]
        comp[i] = t
        comp[j] = mij + mji
        comp[k] = mki + mik
        comp[3] = mkj - mjk
        # Reorder (x, y, z, w) -> (w, x, y, z).
        return jnp.stack((comp[3], comp[0], comp[1], comp[2]), axis=-1), t

    q_0, t_0 = diag_case(0, 1, 2, m00, m11, m22, m01, m10, m20, m02, m21, m12)
    q_1, t_1 = diag_case(1, 2, 0, m11, m22, m00, m12, m21, m01, m10, m02, m20)
    q_2, t_2 = diag_case(2, 0, 1, m22, m00, m11, m20, m02, m12, m21, m10, m01)

    # Diagonal-major selection with the reference's exact tie-breaking.
    i0_is_1 = m11 > m00
    mii0 = jnp.where(i0_is_1, m11, m00)
    use_2 = m22 > mii0
    q_diag = jnp.where(
        use_2[:, None], q_2, jnp.where(i0_is_1[:, None], q_1, q_0)
    )
    t_diag = jnp.where(use_2, t_2, jnp.where(i0_is_1, t_1, t_0))

    use_w = (m00 + m11 + m22) > 0
    q = jnp.where(use_w[:, None], q_w, q_diag)
    t = jnp.where(use_w, t_w, t_diag)

    q = q * (0.5 / jnp.sqrt(t * m33))[:, None]
    return q[0] if single else q


def pose_to_matrix(
    z0: Optional[jnp.ndarray],
    t2: jnp.ndarray,
    s: jnp.ndarray,
    q: jnp.ndarray,
    camera_flipped: bool,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Pose parameters -> cam2world matrix (and focal length for perspective).

    Perspective (z0 is not None): f = 1 + exp(z0); camera sits at distance
    f/s along its -z with screen translation t2/s; returns focal = f/2.
    Orthographic (z0 is None): fork-fixed convention with t3 = (t2, 1)/s.
    camera_flipped negates columns 1..3 (y, z axes and translation).
    """
    rot = quaternion_to_matrix(q)
    if z0 is not None:
        f = 1.0 + jnp.exp(z0)
        t3 = jnp.concatenate(
            ((t2 / s[:, None]), (f / s)[:, None]), axis=-1
        )
        focal = f / 2.0
    else:
        t3 = jnp.concatenate((t2, jnp.ones_like(t2[:, :1])), axis=-1) / s[:, None]
        focal = None
    trans = jnp.sum(t3[:, None, :] * rot, axis=-1)  # R @ t3

    if camera_flipped:
        rot = rot * jnp.asarray([1.0, -1.0, -1.0], rot.dtype)[None, None, :]
        trans = -trans

    top = jnp.concatenate((rot, trans[:, :, None]), axis=-1)  # [B, 3, 4]
    bottom = jnp.zeros_like(top[:, :1, :])
    bottom = bottom.at[:, 0, 3].set(1.0)
    return jnp.concatenate((top, bottom), axis=-2), focal


def matrix_to_pose(
    tform_cam2world: jnp.ndarray,
    focal_length: Optional[jnp.ndarray],
    camera_flipped: bool,
):
    """cam2world matrix -> (z0, t2, s, q) pose parameters (inverse of above)."""
    m = tform_cam2world
    if camera_flipped:
        flip = jnp.asarray([1.0, -1.0, -1.0, -1.0], m.dtype)
        m = jnp.concatenate(
            (m[:, :3, :] * flip[None, None, :], m[:, 3:, :]), axis=-2
        )
    m_inv = invert_space(m)
    t3 = -m_inv[:, :3, 3]

    if focal_length is not None:
        z0 = jnp.log(2.0 * focal_length - 1.0)
        s = 2.0 * focal_length / t3[:, 2]
    else:
        z0 = None
        s = 1.0 / t3[:, 2]

    t2 = t3[:, :2] * s[:, None]
    q = matrix_to_quaternion(m_inv)
    return z0, t2, s, q


def matrix_to_conditioning_vector(
    tform_cam2world: jnp.ndarray,
    focal_length: Optional[jnp.ndarray],
    camera_flipped: bool,
) -> jnp.ndarray:
    """View matrix -> 13-dim discriminator pose conditioning (z0,t2,s,R-flat)."""
    m = tform_cam2world
    if camera_flipped:
        flip = jnp.asarray([1.0, -1.0, -1.0, -1.0], m.dtype)
        m = jnp.concatenate(
            (m[:, :3, :] * flip[None, None, :], m[:, 3:, :]), axis=-2
        )
    m_inv = invert_space(m)
    rot_flat = m_inv[:, :3, :3].reshape(m.shape[0], 9)
    t3 = -m_inv[:, :3, 3]

    if focal_length is not None:
        z0 = jnp.log(focal_length)  # Unshifted log for conditioning.
        s = 2.0 * focal_length / t3[:, 2]
    else:
        s = 1.0 / t3[:, 2]
        z0 = jnp.zeros_like(s)

    t2 = t3[:, :2] * s[:, None]
    return jnp.concatenate(
        (z0[:, None], t2, s[:, None], rot_flat), axis=-1
    )


def perturb_poses(tform_cam2world, avg_angle: float, *extra_args, seed=1234,
                  target_distances=None):
    """Pose-robustness ablation: swap each pose for the dataset pose nearest
    a random target angular distance (reference: lib/pose_utils.py:171-186).
    Host-side numpy; returns (poses, *extra) with the same permutation.
    `target_distances` overrides the random per-pose targets (exact golden
    comparison across RNG implementations)."""
    poses = np.asarray(tform_cam2world)
    dists_all = np.asarray(
        jax.vmap(
            lambda p: rotation_matrix_distance(
                jnp.broadcast_to(p, poses.shape), jnp.asarray(poses)
            )
        )(jnp.asarray(poses))
    )
    if target_distances is None:
        rng = np.random.RandomState(seed)
        target_distances = rng.rand(len(poses)) * avg_angle * 2
    indices = []
    for i in range(len(poses)):
        indices.append(
            int(np.abs(dists_all[i] - target_distances[i]).argmin())
        )
    out_extra = [
        (np.asarray(a)[indices].copy() if a is not None else None)
        for a in extra_args
    ]
    return (poses[indices].copy(), *out_extra)


def rotation_matrix_distance(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance (degrees) between rotations (accepts 4x4 scaled)."""
    if p.shape[-1] == 4:
        p = p[:, :3, :3] / p[:, 3:4, 3:4]
        q = q[:, :3, :3] / q[:, 3:4, 3:4]
    pqt = p @ jnp.swapaxes(q, -2, -1)
    trace = pqt[:, 0, 0] + pqt[:, 1, 1] + pqt[:, 2, 2]
    cos_d = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos_d) / np.pi * 180.0
