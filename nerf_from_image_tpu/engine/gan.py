"""Adversarial training engine: fully jit-compiled G/D steps.

JAX re-design of the reference GAN loop (reference: run.py:947-1518). Every
piece of the per-iteration work — ADA augmentation, warmup blur, rendering,
the discriminator, R1 (grad-of-grad), eikonal/TV/entropy/path-length
regularizers, Adam with lr warmup, gradient clipping, EMA, ADA p adaptation,
SDF parameter clamping — lives inside two jit-compiled step functions
(G-step at even iterations, D-step at odd), so a training iteration is one
XLA program launch per phase with no host sync. Data parallelism is plain
SPMD: shard the batch leaves over the mesh 'data' axis and replicate params;
XLA inserts the gradient psum over ICI.

The reference's dynamic bits are made static-shape: the warmup blur uses a
fixed-support masked kernel (ops/filters.blur_dynamic), and ADA probability /
lr warmup / EMA decay / ppl running average are traced scalars carried in the
train state (no recompilation as they evolve).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.engine import augment as augment_mod
from nerf_from_image_tpu.engine import regularizers
from nerf_from_image_tpu.engine.render import RenderConfig, render
from nerf_from_image_tpu.ops import filters


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    batch_size: int = 32
    latent_dim: int = 512
    lr_g: float = 0.0025
    lr_d: float = 0.002
    lr_warmup_iters: int = 2000
    blur_warmup_iters: int = 12500
    clip_gradient_norm: float = 100.0
    r1: float = 5.0
    eikonal: float = 0.1
    tv: float = 0.5
    entropy: float = 0.05
    path_length_regularization: bool = True
    pl_decay: float = 0.01
    pl_weight: float = 2.0
    supervise_alpha: bool = False
    conditional_pose: bool = True
    white_background: bool = False
    camera_flipped: bool = False
    is_highres: bool = False
    augment_p: float = 0.0
    augment_ada: bool = False
    ada_target: float = 0.6
    ada_interval: int = 4
    ada_rampup: float = 500000.0
    noise_mode: str = "none"  # 'none' (disable_stylegan_noise) or 'random'
    use_sdf: bool = True
    # Conditional / dual-discriminator modes (reference: run.py:959-1055,
    # arguments.py dual_discriminator*): in encoder mode the generator is
    # conditioned on an input image; the optional second discriminator is
    # unconditional and sees a render from an independently drawn pose; the
    # l1/mse variants replace the conditional discriminator with a pixel
    # loss against the (blur-warmed) conditioning image.
    use_encoder: bool = False
    use_class: bool = False
    dual_discriminator: bool = False
    dual_l1: bool = False
    dual_mse: bool = False


class GANState(NamedTuple):
    params_g: Any
    buffers_g: Any
    params_d: Any
    params_ema: Any
    opt_g: Any
    opt_d: Any
    iteration: jnp.ndarray  # scalar int32
    ppl_running_avg: jnp.ndarray  # scalar; <0 means "not yet initialized"
    augment_p_eff: jnp.ndarray  # scalar
    params_d2: Any = None  # second (unconditional) discriminator, dual mode
    opt_d2: Any = None


def softplus_gan_loss(logits: jnp.ndarray, target_positive: bool) -> jnp.ndarray:
    """Non-saturating logistic GAN loss (reference: run.py:353-362)."""
    return jnp.mean(jax.nn.softplus(-logits if target_positive else logits))


def _lr_schedule(target: float, warmup_iters: int):
    """/10 start, linear ramp to target over warmup_iters/2 optimizer steps
    (reference: run.py:662-676, 1436-1446)."""
    start = target / 10.0
    delta = (target - start) / (warmup_iters / 2)

    def schedule(count):
        return jnp.minimum(start + delta * count, target)

    return schedule


def make_optimizers(config: GANTrainConfig):
    def tx(lr_target):
        return optax.chain(
            optax.clip_by_global_norm(config.clip_gradient_norm),
            optax.scale_by_adam(b1=0.0, b2=0.99, eps=1e-8),
            optax.scale_by_learning_rate(
                _lr_schedule(lr_target, config.lr_warmup_iters)
            ),
        )

    return tx(config.lr_g), tx(config.lr_d)


def init_gan_state(
    config: GANTrainConfig,
    model,
    disc,
    key,
    render_config: RenderConfig,
    disc2=None,
) -> GANState:
    kg, kd, kd2 = jax.random.split(key, 3)
    variables = model.init(kg, method="init_all")
    params_g = variables["params"]
    buffers_g = variables.get("buffers", {})
    nc = 4 if config.supervise_alpha else 3
    res = render_config.resolution
    dummy_img = jnp.zeros((2, res, res, nc))
    dummy_pose = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    dummy_focal = jnp.ones((2,))
    dummy_cond = jnp.zeros((2, res, res, 3)) if config.use_encoder else None
    dummy_label = jnp.zeros((2,), jnp.int32) if config.use_class else None

    tx_g, tx_d = make_optimizers(config)
    params_d = opt_d = None
    if not (config.dual_l1 or config.dual_mse):
        params_d = disc.init(
            kd, dummy_img, dummy_pose, dummy_cond, dummy_focal, dummy_label
        )["params"]
        opt_d = tx_d.init(params_d)

    params_d2 = opt_d2 = None
    if config.dual_discriminator:
        params_d2 = (disc2 or disc).init(
            kd2, dummy_img, dummy_pose, None, dummy_focal
        )["params"]
        opt_d2 = tx_d.init(params_d2)

    return GANState(
        params_g=params_g,
        buffers_g=buffers_g,
        params_d=params_d,
        params_ema=params_g,
        opt_g=tx_g.init(params_g),
        opt_d=opt_d,
        iteration=jnp.zeros((), jnp.int32),
        ppl_running_avg=-jnp.ones(()),
        # Fixed-probability augmentation applies from the very first
        # iteration (reference: run.py:950-952); only ADA ramps from 0.
        augment_p_eff=jnp.asarray(
            0.0 if config.augment_ada else config.augment_p, jnp.float32
        ),
        params_d2=params_d2,
        opt_d2=opt_d2,
    )


def _ema_decay(iteration):
    """Warmup-accelerated EMA decay (reference: run.py:365-377).

    The base decay is 0.5**(32/10000) with a hardcoded 32 in the
    reference — it does NOT scale with the configured batch size."""
    alpha = 0.5 ** (32.0 / 10000.0)
    return jnp.where(
        iteration < 1000,
        alpha**100,
        jnp.where(iteration < 10000, alpha**10, alpha),
    )


def update_ema(params_ema, params_g, iteration):
    a = _ema_decay(iteration)
    return jax.tree.map(lambda e, p: e * a + p * (1.0 - a), params_ema, params_g)


def _clamp_sdf_params(params_g, use_sdf: bool):
    """Post-step clamp of the Laplace (beta, alpha) scalars
    (reference: run.py:1069-1071)."""
    if not use_sdf:
        return params_g
    params_g = dict(params_g)
    params_g["beta"] = jnp.maximum(params_g["beta"], 1e-3)
    params_g["alpha"] = jnp.maximum(params_g["alpha"], 1e-3)
    return params_g


def _blur_sigma(iteration, config: GANTrainConfig):
    return filters.blur_schedule_sigma(iteration, config.blur_warmup_iters)


def _disc_input(out, config: GANTrainConfig):
    if config.supervise_alpha:
        return jnp.concatenate((out.rgb, out.mask[..., None]), axis=-1)
    return out.rgb


def g_step(
    config: GANTrainConfig,
    render_config: RenderConfig,
    model,
    disc,
    state: GANState,
    batch: Dict[str, jnp.ndarray],
    key,
    disc2=None,
    batch2: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
    """Generator step (even iterations; reference run.py:954-1073).

    batch: {'pose' [B,4,4], 'focal' [B] or None, 'center', 'bbox'} — raw
    (un-augmented) camera draws; pose augmentation happens in-graph.
    Encoder mode additionally carries 'images' (conditioning) / 'classes';
    dual mode takes a second independent camera draw in `batch2`.
    """
    k_aug, k_z, k_render, k_reg, k_ppl, k_aug2, k_render2 = jax.random.split(
        key, 7
    )
    pose, focal = batch["pose"], batch.get("focal")
    # The conditional L1/MSE branch compares the render pixelwise against
    # the un-transformed conditioning image, so its camera must not be
    # ADA-augmented (reference: run.py:932-934 no_augment).
    if config.augment_p > 0 and not (config.dual_l1 or config.dual_mse):
        _, pose, focal, _ = augment_mod.augment(
            k_aug, None, pose, focal, state.augment_p_eff,
            config.white_background,
        )
    cond_image = batch.get("images") if config.use_encoder else None
    cond_image_rgb = cond_image[..., :3] if cond_image is not None else None
    labels = batch.get("classes") if config.use_class else None

    pose2 = focal2 = None
    if config.dual_discriminator:
        assert batch2 is not None
        pose2, focal2 = batch2["pose"], batch2.get("focal")
        if config.augment_p > 0:
            _, pose2, focal2, _ = augment_mod.augment(
                k_aug2, None, pose2, focal2, state.augment_p_eff,
                config.white_background,
            )

    z = jax.random.normal(k_z, (pose.shape[0], config.latent_dim))

    def loss_fn(params_g):
        variables = {"params": params_g}
        if state.buffers_g:
            variables["buffers"] = state.buffers_g
        out, aux = render(
            render_config,
            model,
            variables,
            pose,
            focal,
            z,
            center=batch.get("center"),
            bbox=batch.get("bbox"),
            key=k_render,
            noise_mode=config.noise_mode,
            label=labels,
            image=cond_image_rgb,
        )
        img = _disc_input(out, config)
        if config.dual_l1 or config.dual_mse:
            # Conditional branch as pixel loss vs the (blurred) input image
            # (reference: run.py:994-1001).
            sigma = _blur_sigma(state.iteration, config)
            target = filters.blur_dynamic(
                cond_image_rgb, sigma, config.white_background
            )
            pix = jnp.square if config.dual_mse else jnp.abs
            loss = jnp.mean(pix(img[..., :3] - target)) * 10.0
        else:
            logits = disc.apply(
                {"params": state.params_d}, img, pose, cond_image_rgb, focal,
                labels,
            )
            loss = softplus_gan_loss(logits, True)
        metrics = {"loss_g": loss}

        if config.dual_discriminator:
            loss = loss / 2.0
            out2, _ = render(
                render_config, model, variables, pose2, focal2, z,
                center=batch2.get("center"), bbox=batch2.get("bbox"),
                key=k_render2, noise_mode=config.noise_mode,
                label=labels, image=cond_image_rgb,
            )
            img2 = _disc_input(out2, config)
            logits2 = (disc2 or disc).apply(
                {"params": state.params_d2}, img2, pose2, None, focal2
            )
            loss2 = softplus_gan_loss(logits2, True)
            metrics["loss_g_uncond"] = loss2
            loss = loss + loss2 / 2.0

        regs = regularizers.volume_regularizers(
            model,
            variables,
            aux["planes"],
            k_reg,
            want_eikonal=config.use_sdf,
            want_tv=config.tv > 0,
            want_entropy=config.entropy > 0,
        )
        warmup_mul = jnp.minimum(state.iteration / config.blur_warmup_iters, 1.0)
        if config.use_sdf:
            eik = jnp.mean(regs["sdf_eikonal_loss"])
            loss = loss + config.eikonal * eik
            metrics["loss_eikonal"] = eik
        if config.tv > 0:
            tv = jnp.mean(regs["total_variation_loss"])
            loss = loss + config.tv * warmup_mul * tv
            metrics["loss_tv"] = tv
        if config.entropy > 0:
            ent = jnp.mean(regs["entropy_loss"])
            loss = loss + config.entropy * warmup_mul * ent
            metrics["loss_entropy"] = ent

        ppl_avg = state.ppl_running_avg
        if config.path_length_regularization:
            ppl = regularizers.path_length(model, variables, aux["ws"], k_ppl)
            pl_weight = config.pl_weight * jnp.minimum(
                state.iteration / config.lr_warmup_iters, 1.0
            )
            ppl_avg = jnp.where(
                state.ppl_running_avg < 0, jnp.mean(ppl), state.ppl_running_avg
            )
            pl_mean = ppl_avg * (1 - config.pl_decay) + jnp.mean(
                ppl
            ) * config.pl_decay
            # The running-average target is detached in the reference
            # (updated via .item(), run.py:1035-1040) — no gradient may
            # flow through mean(ppl) into the penalty's target.
            ppl_loss = jnp.mean(
                jnp.square(ppl - jax.lax.stop_gradient(pl_mean))
            )
            loss = loss + pl_weight * ppl_loss
            metrics["loss_ppl"] = ppl_loss
            ppl_avg = jax.lax.stop_gradient(pl_mean)

        return loss, (metrics, ppl_avg)

    grads, (metrics, ppl_avg) = jax.grad(loss_fn, has_aux=True)(state.params_g)
    tx_g, _ = make_optimizers(config)
    updates, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
    params_g = optax.apply_updates(state.params_g, updates)
    params_g = _clamp_sdf_params(params_g, config.use_sdf)
    params_ema = update_ema(state.params_ema, params_g, state.iteration)
    metrics["grad_norm_g"] = optax.global_norm(grads)

    return (
        state._replace(
            params_g=params_g,
            params_ema=params_ema,
            opt_g=opt_g,
            iteration=state.iteration + 1,
            ppl_running_avg=ppl_avg,
        ),
        metrics,
    )


def _prepare_real_phase(config, state, batch, k_aug):
    """ADA augment image+camera jointly, then warmup blur (real phase)."""
    real_img = batch["images"]
    pose_r, focal_r = batch["pose"], batch.get("focal")
    if config.augment_p > 0:
        img_for_aug = batch.get("images_highres", real_img)
        img_aug, pose_r, focal_r, _ = augment_mod.augment(
            k_aug, img_for_aug, pose_r, focal_r, state.augment_p_eff,
            config.white_background,
        )
        if "images_highres" in batch:
            img_aug = jax.lax.reduce_window(
                img_aug, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0  # Anti-alias back to training res.
        real_img = img_aug
    sigma = _blur_sigma(state.iteration, config)
    real_img = filters.blur_dynamic(real_img, sigma, config.white_background)
    return real_img, pose_r, focal_r


def _render_fake_phase(config, render_config, model, state, batch, keys,
                       cond_image=None, labels=None):
    """Renders the fake batch with the generator frozen."""
    k_aug, k_z, k_render = keys
    pose_f, focal_f = batch["pose"], batch.get("focal")
    if config.augment_p > 0:
        _, pose_f, focal_f, _ = augment_mod.augment(
            k_aug, None, pose_f, focal_f, state.augment_p_eff,
            config.white_background,
        )
    z = jax.random.normal(k_z, (pose_f.shape[0], config.latent_dim))
    variables_g = {"params": state.params_g}
    if state.buffers_g:
        variables_g["buffers"] = state.buffers_g
    out, _ = render(
        render_config, model, variables_g, pose_f, focal_f, z,
        center=batch.get("center"), bbox=batch.get("bbox"),
        key=k_render, noise_mode=config.noise_mode,
        label=labels, image=cond_image,
    )
    fake_img = jax.lax.stop_gradient(_disc_input(out, config))
    return fake_img, pose_f, focal_f


def _d_branch(config, disc, params_d, real, fake, suffix=""):
    """One discriminator's real+R1+fake loss/grads (reference:
    run.py:1085-1146). real/fake: (img, pose, focal, cond_img, label)."""
    real_img, pose_r, focal_r, cond_r, label_r = real
    fake_img, pose_f, focal_f, cond_f, label_f = fake

    def loss_fn(params_d):
        dvars = {"params": params_d}

        def d_real_sum(img):
            return jnp.sum(
                disc.apply(dvars, img, pose_r, cond_r, focal_r, label_r)
            )

        logits_real = disc.apply(
            dvars, real_img, pose_r, cond_r, focal_r, label_r
        )
        loss_real = softplus_gan_loss(logits_real, True)

        grad_penalty = 0.0
        if config.r1 > 0:
            g_img = jax.grad(d_real_sum)(real_img)
            grad_penalty = jnp.mean(
                jnp.sum(jnp.square(g_img.reshape(g_img.shape[0], -1)), axis=1)
            )

        logits_fake = disc.apply(
            dvars, fake_img, pose_f, cond_f, focal_f, label_f
        )
        loss_fake = softplus_gan_loss(logits_fake, False)

        loss = loss_real + (config.r1 / 2.0) * grad_penalty + loss_fake
        metrics = {
            f"loss_d_real{suffix}": loss_real,
            f"loss_d_fake{suffix}": loss_fake,
            f"loss_r1{suffix}": grad_penalty,
            f"sign_real{suffix}": jnp.mean(jnp.sign(logits_real)),
        }
        return loss, metrics

    return jax.grad(loss_fn, has_aux=True)(params_d)


def d_step(
    config: GANTrainConfig,
    render_config: RenderConfig,
    model,
    disc,
    state: GANState,
    real_batch: Dict[str, jnp.ndarray],
    fake_batch: Dict[str, jnp.ndarray],
    key,
    disc2=None,
    real_batch2: Optional[Dict[str, jnp.ndarray]] = None,
    fake_batch2: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
    """Discriminator step (odd iterations; reference run.py:1075-1190).

    real_batch additionally carries 'images' [B, H, W, nc] (and optionally
    'images_highres' for ADA anti-aliased augmentation). Dual mode takes
    independent real/fake draws for the unconditional second discriminator.
    """
    keys = jax.random.split(key, 8)
    _, tx_d = make_optimizers(config)
    metrics: Dict[str, jnp.ndarray] = {}

    params_d, opt_d = state.params_d, state.opt_d
    if not (config.dual_l1 or config.dual_mse):
        real_img, pose_r, focal_r = _prepare_real_phase(
            config, state, real_batch, keys[0]
        )
        cond_r = (
            real_batch["images"][..., :3] if config.use_encoder else None
        )
        label_r = real_batch.get("classes") if config.use_class else None
        cond_f = (
            fake_batch["images"][..., :3]
            if (config.use_encoder and "images" in fake_batch)
            else None
        )
        label_f = fake_batch.get("classes") if config.use_class else None
        fake_img, pose_f, focal_f = _render_fake_phase(
            config, render_config, model, state, fake_batch,
            (keys[1], keys[2], keys[3]), cond_image=cond_f, labels=label_f,
        )
        grads, m0 = _d_branch(
            config, disc, state.params_d,
            (real_img, pose_r, focal_r, cond_r, label_r),
            (fake_img, pose_f, focal_f, cond_f, label_f),
        )
        metrics.update(m0)
        metrics["grad_norm_d"] = optax.global_norm(grads)
    else:
        grads = None

    params_d2, opt_d2 = state.params_d2, state.opt_d2
    grads2 = None
    if config.dual_discriminator:
        rb2 = real_batch2 if real_batch2 is not None else real_batch
        fb2 = fake_batch2 if fake_batch2 is not None else fake_batch
        real_img2, pose_r2, focal_r2 = _prepare_real_phase(
            config, state, rb2, keys[4]
        )
        # The reference's second-D fake phase reuses the FIRST fake
        # phase's z tuple — latents, conditioning image, and class label —
        # and only redraws poses (run.py:1113-1118: sample_batch returns
        # `_, _` for z at discriminator_idx > 0). Same latent key
        # (keys[2]) and fake_batch-sourced conditioning here.
        cond_f2 = (
            fake_batch["images"][..., :3]
            if (config.use_encoder and "images" in fake_batch)
            else None
        )
        label_f2 = fake_batch.get("classes") if config.use_class else None
        fake_img2, pose_f2, focal_f2 = _render_fake_phase(
            config, render_config, model, state, fb2,
            (keys[5], keys[2], keys[7]),
            cond_image=cond_f2, labels=label_f2,
        )
        grads2, m1 = _d_branch(
            config, disc2 or disc, state.params_d2,
            (real_img2, pose_r2, focal_r2, None, None),
            (fake_img2, pose_f2, focal_f2, None, None),
            suffix="_uncond",
        )
        metrics.update(m1)

    if grads is not None and grads2 is not None:
        # The reference clips ONE parameter list spanning both
        # discriminators (run.py:684-688, clip at run.py:1184) — scale
        # both by the combined global norm; the per-optimizer clip inside
        # tx_d is then a no-op.
        joint_norm = optax.global_norm((grads, grads2))
        scale = jnp.minimum(
            1.0,
            config.clip_gradient_norm / jnp.maximum(joint_norm, 1e-12),
        )
        grads = jax.tree.map(lambda g: g * scale, grads)
        grads2 = jax.tree.map(lambda g: g * scale, grads2)
        metrics["grad_norm_d"] = joint_norm
    if grads is not None:
        updates, opt_d = tx_d.update(grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates)
    if grads2 is not None:
        updates2, opt_d2 = tx_d.update(grads2, state.opt_d2, state.params_d2)
        params_d2 = optax.apply_updates(state.params_d2, updates2)

    # ADA adapts on the unconditional discriminator's sign when dual
    # (reference: run.py:1148-1163, unconditional_discriminator_idx).
    sign_key = "sign_real_uncond" if config.dual_discriminator else "sign_real"
    metrics.setdefault(sign_key, jnp.zeros(()))
    metrics["sign_real"] = metrics.get("sign_real", metrics[sign_key])

    # --- ADA p adaptation, every ada_interval-th D step
    # (reference: run.py:1148-1163).
    augment_p_eff = state.augment_p_eff
    if config.augment_ada and config.augment_p > 0:
        is_update = (
            state.iteration % (2 * config.ada_interval)
            == 2 * config.ada_interval - 1
        )
        ada_delta = jnp.sign(metrics[sign_key] - config.ada_target) * (
            config.batch_size * config.ada_interval
        ) / config.ada_rampup
        new_p = jnp.clip(augment_p_eff + ada_delta, 0.0, config.augment_p)
        new_p = jnp.where(
            state.iteration < config.blur_warmup_iters, 0.0, new_p
        )
        augment_p_eff = jnp.where(is_update, new_p, augment_p_eff)
    elif config.augment_p > 0:
        augment_p_eff = jnp.asarray(config.augment_p)
    metrics["augment_p"] = augment_p_eff

    return (
        state._replace(
            params_d=params_d,
            opt_d=opt_d,
            params_d2=params_d2,
            opt_d2=opt_d2,
            iteration=state.iteration + 1,
            augment_p_eff=augment_p_eff,
        ),
        metrics,
    )


def sdf_pretrain_step(
    config: GANTrainConfig,
    model,
    state_params,
    opt_state,
    opt,
    key,
    buffers=None,
    cond_image=None,
    labels=None,
):
    """One step of unit-sphere SDF pretraining (reference: run.py:821-869).

    Conditional modes pretrain with their conditioning too: encoder mode
    draws train images, class mode random labels (run.py:831-839)."""
    k_z, k_reg = jax.random.split(key)
    z = jax.random.normal(k_z, (config.batch_size, config.latent_dim))

    def loss_fn(params):
        variables = {"params": params}
        if buffers:
            variables["buffers"] = buffers
        ws = model.apply(variables, z, labels, cond_image, method="mapping")
        losses = regularizers.sdf_pretrain_losses(model, variables, ws, k_reg)
        loss = jnp.mean(losses["sdf_distance_loss"]) + config.eikonal * jnp.mean(
            losses["sdf_eikonal_loss"]
        )
        return loss, losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state_params
    )
    updates, opt_state = opt.update(grads, opt_state, state_params)
    params = optax.apply_updates(state_params, updates)
    return params, opt_state, loss
