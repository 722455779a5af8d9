"""Frechet Inception Distance — statistics and distance fully on device.

The reference computes FID with pytorch-fid's InceptionV3 and a host-side
scipy sqrtm (reference: lib/fid.py:22-68); scipy's sqrtm is a serial Schur
decomposition — a poor fit for accelerators and a sync point. Here the
matrix square root uses a Newton–Schulz iteration (matmuls only -> MXU),
with the trace-of-sqrt computed on the product Σ1·Σ2 exactly as in the
reference protocol. Activations come from models/inception.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def calculate_stats(activations: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and covariance of [N, D] activations (rowvar=False, ddof=1)."""
    mu = jnp.mean(activations, axis=0)
    x = activations - mu
    sigma = (x.T @ x) / (activations.shape[0] - 1)
    return mu, sigma


def sqrtm_newton_schulz(
    a: jnp.ndarray, num_iters: int = 30, eps: float = 1e-12
) -> jnp.ndarray:
    """Matrix square root of a (near-)PSD matrix via Newton–Schulz.

    Runs in fp64 when enabled, else fp32; pure matmuls, so it lives on the
    MXU and differentiates cleanly. Converges for ||A/||A||_F - I|| < 1,
    which holds for PSD matrices after Frobenius normalization.
    """
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a)) + eps
    y = a / norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)

    def body(_, carry):
        y, z = carry
        t = 0.5 * (eye3 - z @ y)
        return y @ t, t @ z

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return y * jnp.sqrt(norm)


def trace_sqrt_product(sigma1: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    """tr(sqrtm(Σ1 Σ2)) — the cross term of the Frechet distance.

    Σ1Σ2 is similar to the PSD matrix sqrt(Σ2) Σ1 sqrt(Σ2); we take the
    square root of that symmetric form for Newton–Schulz stability (same
    trace, since similar matrices share eigenvalues).
    """
    s2_half = sqrtm_newton_schulz(sigma2)
    sym = s2_half @ sigma1 @ s2_half
    sym = 0.5 * (sym + sym.T)
    return jnp.trace(sqrtm_newton_schulz(sym))


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """FID between two activation Gaussians (reference: lib/fid.py:47-68)."""
    mu1 = jnp.asarray(mu1)
    mu2 = jnp.asarray(mu2)
    sigma1 = jnp.asarray(sigma1)
    sigma2 = jnp.asarray(sigma2)
    # Regularize like the reference does on singular covariances.
    offset = eps * jnp.eye(sigma1.shape[0], dtype=sigma1.dtype)
    diff = mu1 - mu2
    tr_covmean = trace_sqrt_product(sigma1 + offset, sigma2 + offset)
    return (
        diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2) - 2.0 * tr_covmean
    )
