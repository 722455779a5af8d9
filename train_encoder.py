"""Bootstrap-encoder training driver (the reference's train_coord_regressor,
run.py:1521-1706): distills the frozen EMA generator into a SegFormer
encoder that predicts canonical coordinate maps, masks and latents.

Usage:
  python train_encoder.py --dataset p3d_car --resume_from <gan checkpoint> \
      --data_path datasets
Smoke:
  python train_encoder.py --dataset synthetic --batch_size 2 \
      --resolution 16 --iterations 3 --max_images 8 --latent_dim 32
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from nerf_from_image_tpu.utils.host_env import prepare_xla_flags

prepare_xla_flags()

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main():
    from nerf_from_image_tpu import arguments
    from nerf_from_image_tpu.data.loaders import load_dataset
    from nerf_from_image_tpu.data.splits import StepIndexedSampler
    from nerf_from_image_tpu.engine import coord_regressor as cr
    from nerf_from_image_tpu.engine.render import RenderConfig
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.parallel import mesh as mesh_mod
    from nerf_from_image_tpu.utils import checkpoint as ckpt

    args = arguments.parse_args()
    mesh_mod.maybe_init_multihost(args)
    if args.dataset == "autodetect":
        # Dataset from the checkpoint name (reference: run.py:62-64).
        from nerf_from_image_tpu.data.loaders import autodetect_dataset

        assert args.resume_from, "--dataset or --resume_from required"
        args.dataset = autodetect_dataset(args.resume_from)
        print("Autodetected dataset:", args.dataset)
    # Per-dataset defaults apply here exactly like in train.py (reference
    # applies override_default_args before train_coord_regressor) — CARLA
    # in particular trains its generator with view-dependent color.
    from nerf_from_image_tpu.data.loaders import get_train_overrides

    overrides = get_train_overrides(args.dataset)
    args.use_viewdir = args.use_viewdir or overrides.use_viewdir
    args.supervise_alpha = args.supervise_alpha or overrides.supervise_alpha

    config_ds, train_split, _, _ = load_dataset(
        args.dataset, args.data_path, resolution=args.resolution,
        augment_p=0.0, use_class=args.use_class,
        max_images=args.max_images,
    )

    generator = Generator(
        latent_dim=args.latent_dim,
        scene_range=config_ds.scene_range,
        attention_values=args.attention_values,
        use_viewdir=args.use_viewdir,
        use_sdf=args.use_sdf,
        num_classes=train_split.num_classes if args.use_class else None,
    )
    gen_vars = jax.jit(lambda k: generator.init(k, method="init_all"))(
        jax.random.key(0)
    )
    if args.resume_from:
        if args.resume_from.endswith(".pth"):
            from nerf_from_image_tpu.utils import torch_interop

            sd = torch_interop.load_torch_checkpoint(
                args.resume_from, key="model_ema"
            )
            gen_vars = jax.tree.map(
                jnp.asarray,
                torch_interop.state_dict_to_variables(dict(gen_vars), sd),
            )
        else:
            gen_vars = ckpt.generator_variables_from_checkpoint(
                ckpt.load_checkpoint(
                    ckpt.resolve_checkpoint_path(args.resume_from)
                )
            )
        print("Loaded generator from", args.resume_from)

    encoder = BootstrapEncoder(
        # The w head regresses the generator's w (dim w_dim, not z-dim).
        latent_dim=generator.w_dim,
        separate_backbones=args.inv_use_separate,
    )
    max_iters = args.iterations if args.iterations != 300000 else 120000
    config = cr.CoordRegressorConfig(
        batch_size=args.batch_size,
        latent_dim=args.latent_dim,
        max_iters=max_iters,
        # lr drops /10 at 50% of the schedule (reference: run.py:1690-1694).
        lr_drop_at=max_iters // 2,
    )
    render_config = RenderConfig(
        resolution=args.resolution,
        depth_samples_per_ray=64 if args.fine_sampling else 128,
        fine_sampling=args.fine_sampling,
        scene_range=config_ds.scene_range,
        white_background=config_ds.white_background,
        use_viewdir=args.use_viewdir,
        query_chunk=args.query_chunk or None,
        plane_dtype=None
        if args.plane_dtype == "float32"
        else args.plane_dtype,
        merge_mode=args.merge_mode,
    )

    n_chips = args.chips or jax.device_count()
    mesh = mesh_mod.make_mesh(n_data=n_chips, devices=jax.devices()[:n_chips])
    state = cr.init_coord_state(config, encoder, jax.random.key(1))
    start_iter = 0
    resume_path = args.coord_resume_from
    if not resume_path:
        resume_path = ckpt.latest_checkpoint(
            os.path.join(args.root_path, "coords_checkpoints",
                         f"c_{args.dataset}")
        )
    if resume_path and resume_path.endswith(".pth"):
        # Warm-start from a reference-format encoder checkpoint (weights
        # only; optimizer/iteration start fresh).
        from nerf_from_image_tpu.models.encoder import encoder_rename
        from nerf_from_image_tpu.utils import torch_interop

        sd = torch_interop.load_torch_checkpoint(
            resume_path, key="model_coord"
        )
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        loaded = torch_interop.state_dict_to_variables(
            {"params": state.params}, sd, rename=encoder_rename
        )
        state = state._replace(
            params=jax.tree.map(jnp.asarray, loaded["params"])
        )
        print(f"Warm-started encoder weights from {resume_path}")
    elif resume_path:
        # Resume encoder training: params + optimizer + iteration
        # (reference: run.py:1575-1606 coords_checkpoints).
        resume_path = ckpt.resolve_checkpoint_path(resume_path)
        restored = ckpt.load_checkpoint(resume_path, template=state)
        state = restored if isinstance(restored, type(state)) else \
            type(state)(*[restored[k] for k in state._fields]) \
            if isinstance(restored, dict) else state
        start_iter = int(state.iteration)
        print(f"Resuming encoder training from {resume_path} "
              f"(iteration {start_iter})")
    state = mesh_mod.replicate(mesh, state)
    gen_vars = mesh_mod.replicate(mesh, gen_vars)

    sampler = StepIndexedSampler(len(train_split), seed=1234)
    step = jax.jit(
        lambda s, b, k: cr.coord_train_step(
            config, render_config, generator, gen_vars, encoder, s, b, k
        )
    )

    ckpt_dir = os.path.join(args.root_path, "coords_checkpoints",
                            f"c_{args.dataset}")
    from nerf_from_image_tpu.utils.tb import Logger

    writer = Logger(os.path.join(args.root_path, "gan_logs",
                                 f"c_{args.dataset}"))
    key = jax.random.key(2)
    t0 = time.time()
    with jax.sharding.set_mesh(mesh):
        for i in range(start_iter, config.max_iters):
            idx = sampler(i, args.batch_size)
            sel = train_split.select(idx)
            batch = {"pose": jnp.asarray(sel.tform_cam2world)}
            if sel.focal_length is not None:
                batch["focal"] = jnp.asarray(sel.focal_length)
            # The reference samples center/bbox/class alongside the pose
            # (run.py:1625-1638).
            if sel.center is not None:
                batch["center"] = jnp.asarray(sel.center)
            if sel.bbox is not None:
                batch["bbox"] = jnp.asarray(sel.bbox)
            if args.use_class and sel.classes is not None:
                batch["classes"] = jnp.asarray(sel.classes)
            batch = mesh_mod.shard_batch(mesh, batch,
                                         global_batch=args.batch_size)
            key, k = jax.random.split(key)
            state, losses = step(state, batch, k)
            if i % 1000 == 0 or i + 1 == config.max_iters:
                msg = " ".join(
                    f"{k_} {float(v):.5f}" for k_, v in losses.items()
                )
                print(f"[{i}] {msg}  ({(i+1)/(time.time()-t0):.2f} it/s)")
                writer.scalars(losses, i, prefix="coords/")
            if (i + 1) % 10000 == 0 or i + 1 == config.max_iters:
                ckpt.save_checkpoint(
                    os.path.join(ckpt_dir, f"checkpoint_{i + 1}"), state
                )
    print("Encoder training complete.")


if __name__ == "__main__":
    main()
