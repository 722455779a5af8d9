"""Bootstrap-encoder training: self-supervised distillation of the frozen
EMA generator.

JAX re-design of the reference coordinate-regressor trainer (reference:
run.py:1521-1706): draw z -> w through the frozen EMA mapping network,
render (rgb, mask, canonical-coords map) with compute_coords, and train the
SegFormer encoder to regress the coordinate map (mask-weighted L2 norm),
the mask (L1), and the first w (MSE). The generator render and the encoder
update are one fused jit step; the generator is the data source, so there
is no input pipeline at all.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.engine.render import RenderConfig, render


@dataclasses.dataclass(frozen=True)
class CoordRegressorConfig:
    batch_size: int = 32
    latent_dim: int = 512
    lr: float = 6e-5
    max_iters: int = 120000
    lr_drop_at: int = 60000  # max_iters // 2, lr /= 10
    regress_pose: bool = True
    regress_latent: bool = True


class CoordTrainState(NamedTuple):
    params: Any
    opt_state: Any
    iteration: jnp.ndarray


def make_optimizer(config: CoordRegressorConfig):
    def schedule(count):
        return jnp.where(
            count < config.lr_drop_at, config.lr, config.lr / 10.0
        )

    return optax.adam(schedule)


def init_coord_state(config, encoder_model, key) -> CoordTrainState:
    x = jnp.zeros((1, 128, 128, 3))
    params = encoder_model.init(key, x)["params"]
    tx = make_optimizer(config)
    return CoordTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def coord_losses(pred_coords, pred_mask, pred_w, target_coords, target_mask,
                 target_w, config: CoordRegressorConfig):
    """The reference's three loss terms (run.py:1608-1663)."""
    losses = {}
    loss = 0.0
    if config.regress_pose:
        loss_coords = jnp.mean(
            jnp.linalg.norm(pred_coords - target_coords, axis=-1) * target_mask
        )
        loss_mask = jnp.mean(jnp.abs(pred_mask - target_mask))
        losses["loss_coords"] = loss_coords
        losses["loss_mask"] = loss_mask
        loss = loss_coords + loss_mask
    if config.regress_latent:
        loss_latent = jnp.mean(jnp.square(pred_w - target_w))
        losses["loss_latent"] = loss_latent
        loss = loss + loss_latent
    return loss, losses


def coord_train_step(
    config: CoordRegressorConfig,
    render_config: RenderConfig,
    generator,
    generator_ema_variables,
    encoder_model,
    state: CoordTrainState,
    batch: Dict[str, jnp.ndarray],
    key,
) -> Tuple[CoordTrainState, Dict[str, jnp.ndarray]]:
    """One fused sample->render->regress->update step.

    batch: camera draws {'pose', 'focal', 'center', 'bbox'} from the train
    split's pose distribution.
    """
    k_z, k_render, k_drop = jax.random.split(key, 3)
    bs = batch["pose"].shape[0]
    z = jax.random.normal(k_z, (bs, config.latent_dim))

    # Data generation from the frozen EMA generator. Class-conditional
    # generators condition the mapping on the sampled images' labels
    # (reference: run.py:1634-1638 model_ema.class_embedding).
    w = generator.apply(
        generator_ema_variables, z, batch.get("classes"), method="mapping"
    )
    coords_config = dataclasses.replace(render_config, compute_coords=True)
    out, _ = render(
        coords_config,
        generator,
        generator_ema_variables,
        batch["pose"],
        batch.get("focal"),
        w,
        center=batch.get("center"),
        bbox=batch.get("bbox"),
        key=k_render,
    )
    target_image = jnp.clip(out.rgb[..., :3], -1.0, 1.0)
    target_mask = out.mask
    target_coords = out.semantics  # coords ride the semantic slot
    target = jax.lax.stop_gradient(
        (target_image, target_mask, target_coords, w[:, :1])
    )
    target_image, target_mask, target_coords, target_w = target

    def loss_fn(params):
        # Training runs with stochastic depth active (the reference trains
        # the SegFormer in .train() mode, run.py:1619 — drop-path ramped to
        # 0.1, models/segformer.py:24-37); inference paths stay
        # deterministic.
        pred_coords, pred_mask, pred_w = encoder_model.apply(
            {"params": params}, target_image, deterministic=False,
            rngs={"dropout": k_drop},
        )
        return coord_losses(
            pred_coords, pred_mask, pred_w, target_coords, target_mask,
            target_w, config,
        )

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    tx = make_optimizer(config)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    losses["loss"] = loss
    return (
        CoordTrainState(params, opt_state, state.iteration + 1),
        losses,
    )
