"""Generator regularizers: path length, eikonal, SDF distance, TV, entropy.

JAX re-design of the regularizer branch of the reference generator forward
(reference: models/generator.py:484-585). In torch these need
torch.autograd.grad(create_graph=True); in JAX they are ordinary grad-of-
function compositions — second-order flows through when the surrounding loss
is differentiated, with no custom autograd machinery. All of them route field
queries through the pure-XLA decode path (C^2-differentiable grid sampling),
exactly like the reference's `requires_double_backward` escape hatch
(models/generator.py:306-311).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_from_image_tpu.models.generator import (
    laplace_cdf,
    laplace_pdf,
)
from nerf_from_image_tpu.ops.sampling import sample_volume_stratified


def path_length(model, variables, ws, key) -> jnp.ndarray:
    """Per-sample path length ||J^T y|| of the synthesis map at random
    output directions (reference: models/generator.py:484-499)."""
    has_attention = model.attention_values > 0

    def f(ws_):
        planes = model.apply(variables, ws_, method="synthesize")
        if has_attention:
            attn = model.apply(variables, ws_, method="texture")
            return planes, attn
        return planes

    out, vjp = jax.vjp(f, ws)
    if has_attention:
        planes, attn = out
        k1, k2 = jax.random.split(key)
        noise_p = jax.random.normal(k1, planes.shape, planes.dtype) / math.sqrt(
            planes.shape[2] * planes.shape[3]
        )
        noise_a = jax.random.normal(k2, attn.shape, attn.dtype)
        (g,) = vjp((noise_p, noise_a))
    else:
        planes = out
        noise_p = jax.random.normal(
            key, planes.shape, planes.dtype
        ) / math.sqrt(planes.shape[2] * planes.shape[3])
        (g,) = vjp(noise_p)
    return jnp.sqrt(jnp.mean(jnp.sum(jnp.square(g), axis=-1), axis=-1))


def volume_regularizers(
    model,
    variables,
    planes,
    key,
    want_eikonal: bool = True,
    want_distance: bool = False,
    want_tv: bool = True,
    want_entropy: bool = True,
    nstrata: int = 32,
) -> Dict[str, jnp.ndarray]:
    """Eikonal / SDF-distance / total-variation / entropy regularizers over
    stratified volume samples (reference: models/generator.py:505-585).

    Returns per-batch-element losses.
    """
    out: Dict[str, jnp.ndarray] = {}
    B = planes.shape[0]
    k_bins, k_perturb = jax.random.split(key)
    bins = sample_volume_stratified(k_bins, B, nstrata, model.scene_range,
                                    planes.dtype)

    def distance_at(pts):
        d, _ = model.apply(variables, planes, pts / model.scene_range,
                           method="decode")
        return d[..., -1]

    if want_eikonal:
        distance, vjp = jax.vjp(distance_at, bins)
        (grad,) = vjp(jnp.ones_like(distance))
        sdf_magnitude = jnp.linalg.norm(grad, axis=-1)
        out["sdf_eikonal_loss"] = jnp.mean(
            jnp.square(sdf_magnitude - 1.0), axis=1
        )
    else:
        distance = distance_at(bins)

    if want_distance:
        target = jax.lax.stop_gradient(
            jnp.linalg.norm(bins, axis=-1) - 1.0
        )  # Unit sphere.
        out["sdf_distance_loss"] = jnp.mean(
            jnp.square(distance - target), axis=1
        )

    if want_tv or want_entropy:
        if model.use_sdf:
            beta = variables["params"]["beta"][0]
            neg_distance = -distance
            if want_tv:
                coords = jax.lax.stop_gradient(bins / model.scene_range)
                coords_perturb = coords + jax.random.normal(
                    k_perturb, coords.shape, coords.dtype
                ) * 0.004
                d_perturb, _ = model.apply(
                    variables, planes, coords_perturb, method="decode"
                )
                pre = laplace_cdf(neg_distance, beta)
                pre_perturb = laplace_cdf(-d_perturb[..., -1], beta)
                out["total_variation_loss"] = jnp.mean(
                    jnp.abs(pre - pre_perturb), axis=1
                )
            if want_entropy:
                out["entropy_loss"] = jnp.mean(
                    laplace_pdf(neg_distance, beta), axis=1
                )
        else:
            tv_term = jax.nn.sigmoid(distance - 1.0)
            if want_tv:
                coords = jax.lax.stop_gradient(bins / model.scene_range)
                coords_perturb = coords + jax.random.normal(
                    k_perturb, coords.shape, coords.dtype
                ) * 0.004
                d_perturb, _ = model.apply(
                    variables, planes, coords_perturb, method="decode"
                )
                tv_perturb = jax.nn.sigmoid(d_perturb[..., -1] - 1.0)
                out["total_variation_loss"] = jnp.mean(
                    jnp.abs(tv_term - tv_perturb), axis=1
                )
            if want_entropy:
                out["entropy_loss"] = jnp.mean(
                    tv_term * (1.0 - tv_term), axis=1
                )
    return out


def sdf_pretrain_losses(model, variables, ws, key) -> Dict[str, jnp.ndarray]:
    """Unit-sphere SDF fitting + eikonal, used for the 1000-step SDF
    pretraining phase (reference: run.py:821-869)."""
    planes = model.apply(variables, ws, method="synthesize")
    return volume_regularizers(
        model,
        variables,
        planes,
        key,
        want_eikonal=True,
        want_distance=True,
        want_tv=False,
        want_entropy=False,
    )
