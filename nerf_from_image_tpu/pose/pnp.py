"""Batched on-device PnP: coordinate maps + masks -> camera poses.

TPU-native replacement for the reference's per-image OpenCV loop
(reference: lib/pose_estimation.py:30-131: serial host loop over batch x
focal guesses with SQPNP->EPNP fallback and ITERATIVE refine). Here the
whole problem is one batched program:

  weighted DLT (12x12 eigenproblem) -> polar orthogonalization (matmul-only
  Newton, MXU-friendly, no SVD) -> damped Gauss-Newton reprojection refine,

vmapped over batch x focal proposals; the best (err, tz > 0) proposal is
selected per sample and degenerate masks (< 4 points) fall back to the
reference's dummy pose semantics (z = -10, focal = 1, err = 10).

Camera convention matches the reference exactly: pixels are mapped to
screen coordinates (i/W, j/H) - 0.5 with intrinsics diag(f, f, 1); the
solved world2cam is pre-multiplied by diag(1, -1, -1) ("flipped camera").
An OpenCV host-path (`compute_pose_pnp_opencv`) is kept as a verification
oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [.., 3] -> rotation matrix [.., 3, 3]."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    k = rvec / safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], -1),
            jnp.stack([kz, zero, -kx], -1),
            jnp.stack([-ky, kx, zero], -1),
        ],
        -2,
    )
    eye = jnp.eye(3, dtype=rvec.dtype)
    th = theta[..., None]
    return eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)


def polar_orthogonalize(a: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Nearest rotation to a 3x3 matrix via inverse-free Newton iteration
    (pure matmuls; converges to the orthogonal polar factor)."""
    norm = jnp.sqrt(
        jnp.linalg.norm(a, ord=1, axis=(-2, -1))
        * jnp.linalg.norm(a, ord=jnp.inf, axis=(-2, -1))
    )
    x = a / jnp.maximum(norm[..., None, None], 1e-12)
    eye3 = 3.0 * jnp.eye(3, dtype=a.dtype)

    def body(_, x):
        return 0.5 * x @ (eye3 - jnp.swapaxes(x, -2, -1) @ x)

    return jax.lax.fori_loop(0, iters, body, x)


def _dlt_pose(pts: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray):
    """Weighted DLT for P = [R | t] from normalized correspondences.

    pts: [N, 3] world points; uv: [N, 2] focal-normalized screen coords
    (u/f, v/f); w: [N] weights. Returns (R_raw [3,3], t [3]).
    """
    N = pts.shape[0]
    X = jnp.concatenate((pts, jnp.ones((N, 1), pts.dtype)), axis=-1)  # [N,4]
    zeros = jnp.zeros_like(X)
    u = uv[:, 0:1]
    v = uv[:, 1:2]
    row_u = jnp.concatenate((X, zeros, -u * X), axis=-1)  # [N, 12]
    row_v = jnp.concatenate((zeros, X, -v * X), axis=-1)
    A = jnp.concatenate((row_u * w[:, None], row_v * w[:, None]), axis=0)
    M = A.T @ A  # [12, 12]
    evals, evecs = jnp.linalg.eigh(M)
    p = evecs[:, 0].reshape(3, 4)

    # Fix scale by the rotation-part third row, and sign by mean depth.
    scale = jnp.linalg.norm(p[2, :3])
    p = p / jnp.maximum(scale, 1e-12)
    z = X @ p[2, :]  # depths
    sign = jnp.where(jnp.sum(z * w) < 0, -1.0, 1.0)
    p = p * sign
    return p[:, :3], p[:, 3]


def _reproject_residual(R, t, pts, uv, w):
    cam = pts @ R.T + t  # [N, 3]
    z = cam[:, 2:3]
    proj = cam[:, :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return (proj - uv) * w[:, None]


def _gauss_newton_refine(R, t, pts, uv, w, iters: int = 20, damping=1e-6):
    """Damped Gauss-Newton on (so(3) increment, t) minimizing weighted
    reprojection error in normalized coordinates."""

    def body(_, carry):
        R, t = carry
        cam = pts @ R.T + t
        x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
        z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z = 1.0 / z
        u = x * inv_z
        v = y * inv_z
        r = jnp.stack((u - uv[:, 0], v - uv[:, 1]), -1) * w[:, None]

        # d(u,v)/d(cam point)
        du = jnp.stack((inv_z, jnp.zeros_like(z), -x * inv_z**2), -1)
        dv = jnp.stack((jnp.zeros_like(z), inv_z, -y * inv_z**2), -1)
        # cam = R pts + t; d cam/d t = I; d cam/d omega = -[cam]_x
        def cross_jac(c):
            cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
            zero = jnp.zeros_like(cx)
            return jnp.stack(
                [
                    jnp.stack([zero, cz, -cy], -1),
                    jnp.stack([-cz, zero, cx], -1),
                    jnp.stack([cy, -cx, zero], -1),
                ],
                -2,
            )  # [N, 3, 3]

        # cross_jac(c) == -[c]_x, which IS d(omega x c)/d omega. The update
        # below is R <- rodrigues(omega) @ R with t UNROTATED, i.e.
        # cam(omega, dt) = rodrigues(omega) @ (R p) + t + dt — so the
        # rotation Jacobian acts on R p = cam - t, not on cam (using cam
        # here would mis-linearize the translation by omega x t).
        dcam_domega = cross_jac(cam - t)
        Ju_omega = jnp.einsum("ni,nij->nj", du, dcam_domega)
        Jv_omega = jnp.einsum("ni,nij->nj", dv, dcam_domega)
        Ju = jnp.concatenate((Ju_omega, du), -1)  # [N, 6]
        Jv = jnp.concatenate((Jv_omega, dv), -1)
        J = jnp.stack((Ju, Jv), 1).reshape(-1, 6) * jnp.repeat(
            w, 2
        )[:, None]
        r_flat = r.reshape(-1)

        H = J.T @ J + damping * jnp.eye(6, dtype=J.dtype)
        g = J.T @ r_flat
        delta = jnp.linalg.solve(H, g)
        omega, dt = -delta[:3], -delta[3:]
        R_new = rodrigues(omega) @ R
        return R_new, t + dt

    return jax.lax.fori_loop(0, iters, body, (R, t))


def _mean_reproj_error(R, t, pts, uv, w, focal):
    """RMS reprojection error in PIXELS over valid points, matching
    cv2.solvePnPGeneric's reported error scale (pixels of the focal-scaled
    image). `focal` is a scalar or a [2] (fx, fy) vector — each residual
    axis is scaled back by its own focal for anisotropic intrinsics."""
    r = _reproject_residual(R, t, pts, uv, w) * jnp.asarray(focal)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sqrt(jnp.sum(jnp.square(r)) / n)


def _solve_single_focal(pts, uv_pix, w, focal):
    uv = uv_pix / focal
    R_raw, t = _dlt_pose(pts, uv, w)
    R = polar_orthogonalize(R_raw)
    R, t = _gauss_newton_refine(R, t, pts, uv, w)
    err = _mean_reproj_error(R, t, pts, uv, w, focal)
    return R, t, err


def _bit_reversal_permutation(n: int) -> np.ndarray:
    """Deterministic spatially-stratified ordering of n row indices.

    Bit-reversing the linear pixel index is a van-der-Corput-style
    low-discrepancy reordering: any prefix of the reordered sequence
    covers the whole index range (and hence the whole image, for
    row-major pixel grids) near-uniformly. For non-power-of-two n the
    reversed values are ranked by argsort, which preserves the
    stratification property. Computed host-side at trace time (static
    shape), so it costs nothing on device.
    """
    bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> np.uint64(b)) & np.uint64(1)) << np.uint64(
            bits - 1 - b
        )
    if (1 << bits) == n:
        return rev.astype(np.int32)
    return np.argsort(rev, kind="stable").astype(np.int32)


def _compact_foreground(pts, uv_pix, w, max_points):
    """Foreground compaction: keep only (up to) `max_points` mask-selected
    rows per sample before the DLT/Gauss-Newton matmuls.

    Weights zero out background, but without compaction the solver still
    multiplies all H*W rows PER FOCAL GUESS. Rows are first reordered by a
    fixed bit-reversal (spatially stratified) permutation, then top_k on
    the binary weights selects foreground rows (plus zero-weight pads).
    Whenever the mask has <= max_points pixels the solve is bit-equivalent
    to the uncompacted one (weighted LS is row-order invariant; zero rows
    contribute nothing) at a fraction of the FLOPs. Oversized masks
    (> max_points foreground pixels, i.e. > half the crop at the default)
    are truncated to the first max_points foreground rows in the
    stratified order — top_k breaks ties in ascending index order, and in
    bit-reversed order any index prefix covers the image near-uniformly,
    so the kept subset spans the full object extent instead of its top
    rows (tests/test_pnp.py::test_compaction_oversized_mask_is_unbiased).
    Measured: see scripts/bench_pnp.py."""
    if max_points is None or max_points >= pts.shape[1]:
        return pts, uv_pix, w
    perm = jnp.asarray(_bit_reversal_permutation(pts.shape[1]))
    pts = pts[:, perm]
    uv_pix = uv_pix[:, perm]
    w = w[:, perm]
    _, sel = jax.lax.top_k(w, max_points)
    pts = jnp.take_along_axis(pts, sel[..., None], axis=1)
    uv_pix = jnp.take_along_axis(uv_pix, sel[..., None], axis=1)
    w = jnp.take_along_axis(w, sel, axis=1)
    return pts, uv_pix, w


def compute_pose_pnp(
    coords: jnp.ndarray,
    masks: jnp.ndarray,
    focal_guesses: Optional[jnp.ndarray],
    max_points: Optional[int] = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched PnP over a grid coordinate map.

    Args:
      coords: [B, H, W, 3] predicted canonical (world) coordinates.
      masks: [B, H, W] boolean/{0,1} foreground mask.
      focal_guesses: [K] candidate focal lengths.
      max_points: foreground-compaction budget (see _compact_foreground);
        None disables compaction.

    Returns:
      (world2cam [B, 4, 4] — flipped-camera convention, focal [B], err [B]).
    """
    B, H, W, _ = coords.shape
    ii = jnp.arange(W, dtype=coords.dtype)[None, :] / W
    jj = jnp.arange(H, dtype=coords.dtype)[:, None] / H
    gx = jnp.broadcast_to(ii, (H, W)) - 0.5
    gy = jnp.broadcast_to(jj, (H, W)) - 0.5
    uv_pix = jnp.stack((gx, gy), -1).reshape(1, -1, 2)
    uv_pix = jnp.broadcast_to(uv_pix, (B, H * W, 2))
    pts = coords.reshape(B, -1, 3)
    w = masks.reshape(B, -1).astype(coords.dtype)
    pts, uv_pix, w = _compact_foreground(pts, uv_pix, w, max_points)

    focals = jnp.asarray(focal_guesses, coords.dtype)

    def per_sample(pts_i, uv_i, w_i):
        def per_focal(f):
            return _solve_single_focal(pts_i, uv_i, w_i, f)

        R_all, t_all, err_all = jax.vmap(per_focal)(focals)
        # isfinite guard: a focal guess whose Gauss-Newton diverged (NaN
        # error) must not win the argmin over a converged guess — the
        # reference's serial `e < best_err` comparison could never select
        # a NaN candidate.
        valid = (t_all[:, 2] > 0) & jnp.isfinite(err_all)
        err_masked = jnp.where(valid, err_all, jnp.inf)
        best = jnp.argmin(err_masked)
        any_valid = jnp.any(valid) & (jnp.sum(w_i) >= 4)

        R_best = R_all[best]
        t_best = t_all[best]
        f_best = focals[best]
        e_best = err_masked[best]

        # Dummy-pose fallback (reference: lib/pose_estimation.py:113-118).
        R_dummy = jnp.eye(3, dtype=pts_i.dtype)
        t_dummy = jnp.asarray([0.0, 0.0, -10.0], pts_i.dtype)
        R_out = jnp.where(any_valid, R_best, R_dummy)
        t_out = jnp.where(any_valid, t_best, t_dummy)
        f_out = jnp.where(any_valid, f_best, 1.0)
        e_out = jnp.where(any_valid, e_best, 10.0)

        m = jnp.eye(4, dtype=pts_i.dtype)
        m = m.at[:3, :3].set(R_out)
        m = m.at[:3, 3].set(t_out)
        flip = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], pts_i.dtype))
        return flip @ m, f_out, e_out

    return jax.vmap(per_sample)(pts, uv_pix, w)


def compute_pose_pnp_known_k(
    coords: jnp.ndarray,
    masks: jnp.ndarray,
    intrinsics: jnp.ndarray,
    max_points: Optional[int] = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PnP with known per-sample intrinsics (driving evals; reference:
    lib/pose_estimation.py:134-235 compute_pose_pnp_new).

    Args:
      coords: [B, H, W, 3]; masks: [B, H, W] in [0, 1] (threshold 0.9);
      intrinsics: [B, 3, 3] normalized to the crop (focal + principal point
        in the (i/W - 0.5, j/H - 0.5) screen units).
      max_points: foreground-compaction budget (see _compact_foreground).
    Returns:
      (world2cam [B, 4, 4] flipped-camera convention, err [B]).
    """
    B, H, W, _ = coords.shape
    ii = jnp.arange(W, dtype=coords.dtype)[None, :] / W
    jj = jnp.arange(H, dtype=coords.dtype)[:, None] / H
    gx = jnp.broadcast_to(ii, (H, W)) - 0.5
    gy = jnp.broadcast_to(jj, (H, W)) - 0.5
    uv_pix = jnp.stack((gx, gy), -1).reshape(1, -1, 2)
    uv_pix = jnp.broadcast_to(uv_pix, (B, H * W, 2))
    pts = coords.reshape(B, -1, 3)
    w = (masks.reshape(B, -1) > 0.9).astype(coords.dtype)
    pts, uv_pix, w = _compact_foreground(pts, uv_pix, w, max_points)

    def per_sample(pts_i, uv_i, w_i, K):
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        uv_norm = jnp.stack(
            ((uv_i[:, 0] - cx) / fx, (uv_i[:, 1] - cy) / fy), -1
        )
        R_raw, t = _dlt_pose(pts_i, uv_norm, w_i)
        R = polar_orthogonalize(R_raw)
        R, t = _gauss_newton_refine(R, t, pts_i, uv_norm, w_i)
        err = _mean_reproj_error(
            R, t, pts_i, uv_norm, w_i, jnp.stack((fx, fy))
        )

        # isfinite guard: a diverged Gauss-Newton (inf t -> NaN residual)
        # must fall through to the dummy pose, matching the reference's
        # try/except-to-dummy semantics (lib/pose_estimation.py:113-118).
        ok = (t[2] > 0) & (jnp.sum(w_i) >= 4) & jnp.isfinite(err)
        R_dummy = jnp.eye(3, dtype=pts_i.dtype)
        t_dummy = jnp.asarray([0.0, 0.0, -10.0], pts_i.dtype)
        R_out = jnp.where(ok, R, R_dummy)
        t_out = jnp.where(ok, t, t_dummy)
        e_out = jnp.where(ok, err, 10.0)
        m = jnp.eye(4, dtype=pts_i.dtype)
        m = m.at[:3, :3].set(R_out)
        m = m.at[:3, 3].set(t_out)
        flip = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], pts_i.dtype))
        return flip @ m, e_out

    return jax.vmap(per_sample)(pts, uv_pix, w, intrinsics)


def estimate_poses_batch(
    coords: jnp.ndarray,
    masks: jnp.ndarray,
    focal_guesses: Optional[np.ndarray],
):
    """Encoder outputs -> cam2world + focal (reference: run.py:1709-1740).

    Orthographic datasets (focal_guesses None) use the large-focal
    approximation with the reference's exact ortho back-conversion.
    """
    from nerf_from_image_tpu.pose.pose import invert_space

    masks_bin = masks > 0.9
    is_ortho = focal_guesses is None
    guesses = jnp.asarray([100.0]) if is_ortho else jnp.asarray(focal_guesses)

    world2cam, focal, errors = compute_pose_pnp(coords, masks_bin, guesses)

    if is_ortho:
        s = 2.0 * guesses[0] / -world2cam[:, 2, 3]
        t2 = world2cam[:, :2, 3] * s[:, None]
        world2cam = world2cam.at[:, :2, 3].set(t2)
        world2cam = world2cam.at[:, 2, 3].set(-10.0)

    cam2world = invert_space(world2cam)
    if is_ortho:
        cam2world = cam2world / s[:, None, None]
        return cam2world, None, errors
    return cam2world, focal, errors


def get_focal_guesses(focal_length) -> Optional[np.ndarray]:
    """Percentiles of the train-set focals (reference:
    lib/pose_estimation.py:238-247)."""
    if focal_length is None:
        return None
    sorted_focals = np.sort(np.asarray(focal_length))
    guesses = np.percentile(
        sorted_focals, [1, 10, 20, 30, 40, 50, 60, 70, 80, 90, 99]
    )
    return np.unique(guesses)


def compute_pose_pnp_opencv(coords, masks, focal_guesses):
    """Host OpenCV oracle with the reference's solver chain (verification
    only; requires cv2)."""
    import cv2

    coords = np.asarray(coords)
    masks = np.asarray(masks)
    bs, height, width, _ = coords.shape
    ii, jj = np.meshgrid(
        np.arange(width) / width, np.arange(height) / height, indexing="xy"
    )
    grid_xy = (np.stack((ii, jj), -1) - 0.5).reshape(-1, 2)
    out_mats, out_focals, out_errs = [], [], []
    for idx in range(bs):
        fg = np.where(masks[idx].reshape(-1))[0]
        pts = coords[idx].reshape(-1, 3)[fg].astype(np.float64)
        uv = grid_xy[fg]
        best = None
        best_err = np.inf
        for focal in focal_guesses:
            if len(fg) < 4:
                break
            K = np.diag([focal, focal, 1.0])
            # Reference solver chain (lib/pose_estimation.py:57-105):
            # SQPNP, falling back to EPNP when it throws; best valid
            # (tz > 0) solution; then SOLVEPNP_ITERATIVE refinement from
            # that solution, kept only if it stays in front of the camera.
            sol = None
            for flags in (cv2.SOLVEPNP_SQPNP, cv2.SOLVEPNP_EPNP):
                try:
                    _, rvecs, tvecs, errs = cv2.solvePnPGeneric(
                        pts, uv, K, None, flags=flags
                    )
                except cv2.error:
                    continue
                cands = [
                    (float(e[0]), rv, tv)
                    for rv, tv, e in zip(rvecs, tvecs, errs)
                    if tv[2] > 0
                ]
                if cands:
                    sol = min(cands, key=lambda c: c[0])
                    break
            if sol is None:
                continue
            e, rv, tv = sol
            try:
                retval, rv_, tv_, e_ = cv2.solvePnPGeneric(
                    pts, uv, K, None, flags=cv2.SOLVEPNP_ITERATIVE,
                    useExtrinsicGuess=True, rvec=rv, tvec=tv,
                )
                if retval == 1 and tv_[0][2] > 0:
                    rv, tv, e = rv_[0], tv_[0], float(e_[0][0])
            except cv2.error:
                pass
            if e < best_err:
                best_err = e
                best = (rv, tv, focal)
        if best is None:
            rv, tv, focal, best_err = np.zeros(3), np.array([0, 0, -10.0]), 1.0, 10.0
        else:
            rv, tv, focal = best
        m = np.eye(4)
        m[:3, :3] = cv2.Rodrigues(np.asarray(rv, np.float64))[0]
        m[:3, 3] = np.asarray(tv).flatten()
        flip = np.diag([1.0, -1.0, -1.0, 1.0])
        out_mats.append(flip @ m)
        out_focals.append(focal)
        out_errs.append(best_err)
    return np.stack(out_mats), np.asarray(out_focals), np.asarray(out_errs)
