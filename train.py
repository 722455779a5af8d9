"""GAN training driver (the reference's `python run.py --dataset X` path).

Builds the data-parallel mesh, loads the dataset into host RAM, runs SDF
pretraining, then alternates jit-compiled G/D steps with periodic evaluation
and orbax checkpoints. See nerf_from_image_tpu/arguments.py for flags.

Example (smoke): python train.py --dataset synthetic --batch_size 8 \
    --resolution 32 --iterations 20 --max_images 32
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from nerf_from_image_tpu.utils.host_env import prepare_xla_flags

prepare_xla_flags()

import jax

# Persistent compilation cache (XLA compiles of the G/D steps take minutes;
# restarts and resumes skip them).
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # The environment may pin the axon TPU plugin via sitecustomize; honor
    # an explicit CPU request (tests / debugging).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    import optax

    from nerf_from_image_tpu import arguments
    from nerf_from_image_tpu.data.loaders import get_train_overrides, load_dataset
    from nerf_from_image_tpu.data.splits import StepIndexedSampler
    from nerf_from_image_tpu.engine import gan
    from nerf_from_image_tpu.engine.render import RenderConfig
    from nerf_from_image_tpu.models.discriminator import Discriminator
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.parallel import mesh as mesh_mod
    from nerf_from_image_tpu.utils import checkpoint as ckpt

    args = arguments.parse_args()
    mesh_mod.maybe_init_multihost(args)
    if args.run_inversion:
        # Reference CLI compatibility: run.py --run_inversion skips GAN
        # training and runs the hybrid-inversion driver (run.py:1743).
        import invert

        invert.main()
        return
    assert args.dataset != "autodetect", "--dataset required for training"
    overrides = get_train_overrides(args.dataset)
    if args.augment_p == 0:
        args.augment_p = overrides.augment_p
        args.augment_ada = args.augment_ada or overrides.augment_ada
    args.supervise_alpha = args.supervise_alpha or overrides.supervise_alpha
    args.use_viewdir = args.use_viewdir or overrides.use_viewdir
    if args.iterations == 300000:
        args.iterations = overrides.iterations
    # cub/imagenet_elephant presets (reference data/loaders.py:92-107):
    # StyleGAN noise enabled and, for elephants, R1 weight 10 — applied
    # only when the user left the flag at its default.
    if args.disable_stylegan_noise:
        args.disable_stylegan_noise = overrides.disable_stylegan_noise
    if args.r1 == 5.0:
        args.r1 = overrides.r1

    experiment_name = arguments.suggest_experiment_name(args)
    print("Experiment:", experiment_name)
    checkpoint_dir = os.path.join(args.root_path, "gan_checkpoints",
                                  experiment_name)

    config_ds, train_split, train_eval_split, test_split = load_dataset(
        args.dataset,
        args.data_path,
        resolution=args.resolution,
        augment_p=args.augment_p,
        use_class=args.use_class,
        max_images=args.max_images,
        # Encoder-mode training additionally evaluates recon metrics on
        # the held-out test split (reference: run.py:1391-1398).
        need_test=bool(args.use_encoder),
    )

    if args.perturb_poses > 0:
        # Pose-robustness ablation (reference: run.py:160-173).
        import dataclasses as _dc

        from nerf_from_image_tpu.pose.pose import perturb_poses

        print("Perturbing poses", args.perturb_poses)
        p_pose, p_focal, p_bbox = perturb_poses(
            train_split.tform_cam2world, args.perturb_poses,
            train_split.focal_length, train_split.bbox,
        )
        shared = train_eval_split is train_split or (
            train_eval_split.tform_cam2world.shape
            == train_split.tform_cam2world.shape
        )
        train_split = _dc.replace(
            train_split, tform_cam2world=p_pose, focal_length=p_focal,
            bbox=p_bbox,
        )
        if shared:
            train_eval_split = _dc.replace(
                train_eval_split, tform_cam2world=p_pose,
                focal_length=p_focal, bbox=p_bbox,
            )
        else:
            e_pose, e_focal, e_bbox = perturb_poses(
                train_eval_split.tform_cam2world, args.perturb_poses,
                train_eval_split.focal_length, train_eval_split.bbox,
            )
            train_eval_split = _dc.replace(
                train_eval_split, tform_cam2world=e_pose,
                focal_length=e_focal, bbox=e_bbox,
            )

    n_chips = args.chips or jax.device_count()
    mesh = mesh_mod.make_mesh(n_data=n_chips,
                              devices=jax.devices()[:n_chips])
    print(f"Mesh: {n_chips} chips, dataset {len(train_split)} images")

    model = Generator(
        latent_dim=args.latent_dim,
        scene_range=config_ds.scene_range,
        attention_values=args.attention_values,
        use_viewdir=args.use_viewdir,
        use_encoder=args.use_encoder,
        use_sdf=args.use_sdf,
        num_classes=train_split.num_classes if args.use_class else None,
    )
    disc = Discriminator(
        resolution=args.resolution,
        nc=4 if args.supervise_alpha else 3,
        camera_flipped=config_ds.camera_flipped,
        conditional_pose=args.conditional_pose,
        use_encoder=args.use_encoder,
        num_classes=train_split.num_classes if args.use_class else None,
    )
    # Second, unconditional discriminator for dual mode (reference:
    # run.py:641-644 — pose-conditioned but no image/class embedding).
    disc2 = None
    if args.dual_discriminator:
        disc2 = Discriminator(
            resolution=args.resolution,
            nc=4 if args.supervise_alpha else 3,
            camera_flipped=config_ds.camera_flipped,
            conditional_pose=args.conditional_pose,
        )
    config = gan.GANTrainConfig(
        batch_size=args.batch_size,
        latent_dim=args.latent_dim,
        lr_g=args.lr_g,
        lr_d=args.lr_d,
        clip_gradient_norm=args.clip_gradient_norm,
        r1=args.r1,
        eikonal=args.eikonal,
        tv=args.tv,
        entropy=args.entropy,
        path_length_regularization=args.path_length_regularization,
        supervise_alpha=args.supervise_alpha,
        conditional_pose=args.conditional_pose,
        white_background=config_ds.white_background,
        camera_flipped=config_ds.camera_flipped,
        is_highres=config_ds.is_highres,
        augment_p=args.augment_p,
        augment_ada=args.augment_ada,
        ada_target=args.ada_target,
        noise_mode="none" if args.disable_stylegan_noise else "random",
        use_sdf=args.use_sdf,
        use_encoder=args.use_encoder,
        use_class=args.use_class,
        dual_discriminator=args.dual_discriminator,
        dual_l1=args.dual_discriminator_l1,
        dual_mse=args.dual_discriminator_mse,
    )
    render_config = RenderConfig(
        resolution=args.resolution,
        depth_samples_per_ray=64 if args.fine_sampling else 128,
        fine_sampling=args.fine_sampling,
        scene_range=config_ds.scene_range,
        white_background=config_ds.white_background,
        use_viewdir=args.use_viewdir,
        query_chunk=args.query_chunk or None,  # 0 = unchunked
        plane_dtype=None
        if args.plane_dtype == "float32"
        else args.plane_dtype,
        merge_mode=args.merge_mode,
        # Legal on the G-step's MAIN render: path_length differentiates
        # only the synthesis map and the volume regularizers decode their
        # own stratified samples through the double-backward grid-sample
        # branch, so no grad-of-grad crosses the splat's custom_vjp
        # (verified: tests/test_splat.py::
        # test_g_step_with_plane_splat_matches_default_path).
        plane_splat=args.plane_splat,
    )

    key = jax.random.key(1234)
    key, k_init = jax.random.split(key)
    state = gan.init_gan_state(
        config, model, disc, k_init, render_config, disc2=disc2
    )

    start_iter = 0
    if args.resume_from:
        latest = args.resume_from
        if not os.path.exists(latest):
            raise ValueError(
                f"Specified checkpoint {args.resume_from} does not exist!"
            )
        latest = ckpt.resolve_checkpoint_path(latest)
    else:
        latest = ckpt.latest_checkpoint(checkpoint_dir)
    if latest is not None:
        print("Resuming from", latest)
        restored, restored_key = ckpt.load_train_checkpoint(
            latest, template=state
        )
        restored_iter = int(
            restored["iteration"]
            if isinstance(restored, dict)
            else restored.iteration
        )
        if not args.resume_from and restored_iter < config.blur_warmup_iters:
            # Warm-up was not completed — train from scratch instead
            # (reference: run.py:134-143).
            print("Aborting resume (training from scratch)")
        else:
            state = jax.tree.map(
                lambda t, r: r, state, restored
            ) if not isinstance(restored, type(state)) else restored
            if restored_key is not None:
                key = restored_key
            start_iter = restored_iter

    state = mesh_mod.replicate(mesh, state)

    # Step-indexed sampler: the batch stream is a pure function of the
    # iteration, so resume reproduces the exact sequence with no persisted
    # sampler state (the reference checkpoints its sampler pointer + numpy
    # RNG instead: run.py:1475-1516).
    sampler = StepIndexedSampler(len(train_split), seed=1234)

    def host_batch(draw: int, with_images: bool):
        idx = sampler(draw, args.batch_size)
        sel = train_split.select(idx)
        batch = {"pose": jnp.asarray(sel.tform_cam2world)}
        if sel.focal_length is not None:
            batch["focal"] = jnp.asarray(sel.focal_length)
        if sel.center is not None:
            batch["center"] = jnp.asarray(sel.center)
        if args.use_class and sel.classes is not None:
            batch["classes"] = jnp.asarray(sel.classes)
        if with_images or args.use_encoder:
            # Encoder-conditional mode conditions the generator on the
            # drawn images even on G / fake draws (reference:
            # run.py:959-1009).
            nc = 4 if args.supervise_alpha else 3
            batch["images"] = jnp.asarray(sel.images[..., :nc])
            if with_images and sel.images_highres is not None:
                batch["images_highres"] = jnp.asarray(
                    sel.images_highres[..., :nc]
                )
        return mesh_mod.shard_batch(mesh, batch,
                                    global_batch=args.batch_size)

    # SDF pretraining (reference: run.py:821-869). Conditional modes
    # pretrain with their conditioning: encoder mode draws train images,
    # class mode random labels (run.py:831-839).
    if args.use_sdf and start_iter == 0:
        print("SDF pretraining...")
        pretrain_opt = optax.adam(args.lr_g)
        pre_state = pretrain_opt.init(state.params_g)
        pre_step = jax.jit(
            lambda p, o, k, img, lbl: gan.sdf_pretrain_step(
                config, model, p, o, pretrain_opt, k,
                buffers=state.buffers_g, cond_image=img, labels=lbl,
            )
        )
        pre_rng = np.random.default_rng(4321)
        n_train = len(train_split)

        def pre_cond():
            img = lbl = None
            if args.use_encoder:
                sel = train_split.select(
                    pre_rng.integers(0, n_train, args.batch_size)
                )
                img = mesh_mod.shard_batch(
                    mesh, jnp.asarray(sel.images[..., :3])
                )
            if args.use_class:
                lbl = mesh_mod.shard_batch(
                    mesh,
                    jnp.asarray(
                        pre_rng.integers(
                            0, train_split.num_classes, args.batch_size
                        )
                    ),
                )
            return img, lbl

        params_g = state.params_g
        for i in range(args.sdf_pretrain_steps):
            key, k = jax.random.split(key)
            img, lbl = pre_cond()
            params_g, pre_state, loss = pre_step(
                params_g, pre_state, k, img, lbl
            )
            if i % 100 == 0:
                print(f"  [{i}] sdf pretrain loss {float(loss):.4f}")
        state = state._replace(params_g=params_g, params_ema=params_g)
        print("SDF pretraining done.")

    g_step = jax.jit(
        lambda s, b, k, b2=None: gan.g_step(
            config, render_config, model, disc, s, b, k,
            disc2=disc2, batch2=b2,
        )
    )
    d_step = jax.jit(
        lambda s, rb, fb, k, rb2=None, fb2=None: gan.d_step(
            config, render_config, model, disc, s, rb, fb, k,
            disc2=disc2, real_batch2=rb2, fake_batch2=fb2,
        )
    )

    from nerf_from_image_tpu.utils.tb import Logger

    writer = Logger(os.path.join(args.root_path, "gan_logs", experiment_name))

    # Optional on-device FID (needs InceptionV3 weights; see
    # models/inception.py — set NFI_INCEPTION_WEIGHTS to a pytorch-fid
    # checkpoint to enable metric-grade numbers).
    fid_eval = None
    inception_weights = os.environ.get("NFI_INCEPTION_WEIGHTS")
    have_inception = bool(
        inception_weights and os.path.exists(inception_weights)
    )
    # The train-time evaluate() runs whenever FID is possible (Inception
    # weights present) or encoder-mode recon metrics apply (reference:
    # run.py:1200-1401 always evaluates; without weights we still emit the
    # recon PSNR/SSIM/LPIPS scalars, just no FID).
    if have_inception or args.use_encoder:
        from nerf_from_image_tpu.engine import gan_eval
        from nerf_from_image_tpu.data.splits import (
            compute_eval_indices,
            compute_view_perm,
            draw_eval_latents,
        )

        inception = None
        inc_vars = None
        real_stats = None
        if have_inception:
            from nerf_from_image_tpu.models.inception import (
                FIDInceptionV3,
                inception_state_to_variables,
            )
            from nerf_from_image_tpu.utils import torch_interop

            inception = FIDInceptionV3()
            inc_vars = inception.init(
                jax.random.key(99), jnp.zeros((1, 64, 64, 3))
            )
            inc_vars = inception_state_to_variables(
                dict(inc_vars),
                torch_interop.load_torch_checkpoint(inception_weights),
            )
            inc_vars = jax.tree.map(jnp.asarray, inc_vars)
            real_stats = gan_eval.compute_real_fid_stats(
                inception, inc_vars, train_eval_split.images
            )
        eval_indices = compute_eval_indices(train_eval_split)
        z_fid = draw_eval_latents(len(eval_indices), args.latent_dim)
        # Test-split eval machinery (reference: run.py:479-499 — the test
        # eval indices, their view permutation, and a second z draw).
        test_eval_indices = None
        test_eval_perm = None
        z_fid_test = None
        test_real_stats = None
        if (
            args.use_encoder
            and config_ds.views_per_object_test
            and test_split is not None
            and len(test_split)
        ):
            test_eval_indices = compute_eval_indices(test_split)
            test_eval_perm = compute_view_perm(
                test_eval_indices, config_ds.views_per_object_test
            )
            z_fid_test = draw_eval_latents(
                len(test_eval_perm), args.latent_dim, seed=4322
            )
            print(
                f"Evaluating test set on {len(test_eval_indices)} images"
            )
            if have_inception:
                test_real_stats = gan_eval.compute_real_fid_stats(
                    inception, inc_vars, test_split.images
                )
        lpips_vars = None
        lpips_model = None
        if args.use_encoder:
            # Encoder-conditional recon eval also scores LPIPS
            # (reference: run.py:1283-1285).
            from nerf_from_image_tpu.models.lpips import (
                LPIPS,
                init_lpips_variables,
            )

            lpips_model = LPIPS()
            lpips_vars = init_lpips_variables(
                lpips_model, jax.random.key(98), args.resolution
            )
        recon_fn = jax.jit(
            gan_eval.make_recon_eval_fn(render_config, model, inception,
                                        inc_vars, lpips_model, lpips_vars)
        )
        eval_perm = compute_view_perm(
            eval_indices, config_ds.views_per_object
        )

        def fid_eval(st):
            """Training-time evaluate(): generation FID, or front+random
            reconstruction metrics in encoder-conditional mode — on the
            train-eval split AND, when the dataset has a registered test
            split, the held-out test split (reference: run.py:1365-1401;
            TB scalar names follow the reference:
            reconstruction/{psnr,ssim,lpips,iou}[_test]_{front,random},
            reconstruction/fid_{front,random}view[_test],
            generation/fid_untrunc).
            current_fid follows the random-view recon FID when
            use_encoder."""
            variables = {"params": st.params_ema}
            if st.buffers_g:
                variables["buffers"] = st.buffers_g
            if not args.use_encoder:
                r = gan_eval.evaluate_recon(
                    recon_fn, variables, z_fid, train_eval_split,
                    eval_indices, real_stats, use_labels=args.use_class,
                )
                return {
                    "fid": r.get("fid"),
                    "generation/fid_untrunc": r.get("fid"),
                    "first_batch": r["first_batch"],
                }

            out = {"first_batch": None, "fid": None}

            def run_mode(split, indices, perm, z, mode, views, inputs,
                         suffix, stats):
                r = gan_eval.evaluate_recon(
                    recon_fn, variables, z, split, indices, stats,
                    recon_mode=mode,
                    perm_indices=perm if mode == "random" else None,
                    views_per_object=views,
                    input_images=inputs,
                    use_labels=args.use_class,
                )
                for k, v in r.items():
                    if k in ("first_batch", "n_images", "fid"):
                        continue
                    out[f"reconstruction/{k}{suffix}_{mode}"] = v
                if stats is not None and r.get("fid") is not None:
                    out[f"reconstruction/fid_{mode}view{suffix}"] = r["fid"]
                return r

            rf = run_mode(
                train_eval_split, eval_indices, eval_perm, z_fid, "front",
                config_ds.views_per_object, train_split.images, "",
                real_stats,
            )
            rr = run_mode(
                train_eval_split, eval_indices, eval_perm, z_fid, "random",
                config_ds.views_per_object, train_split.images, "",
                real_stats,
            )
            out["first_batch"] = rf["first_batch"]
            # current_fid = random-view recon FID (reference run.py:1393).
            out["fid"] = rr.get("fid", rf.get("fid"))
            if test_eval_indices is not None:
                # Held-out test split. The reference's
                # evaluate(use_testset=True) DOES compute inception
                # activations and a FID against test_split.fid_stats
                # (run.py:1363-1366) — its callers just discard the
                # return value (run.py:1396-1401), so no testset-FID
                # scalar is ever logged. We log it
                # (reconstruction/fid_{mode}view_test): the computation
                # is already paid for and the held-out number is
                # strictly more informative. Decision: PARITY.md §2.6.
                run_mode(
                    test_split, test_eval_indices, test_eval_perm,
                    z_fid_test, "front", config_ds.views_per_object_test,
                    test_split.images, "_test", test_real_stats,
                )
                run_mode(
                    test_split, test_eval_indices, test_eval_perm,
                    z_fid_test, "random", config_ds.views_per_object_test,
                    test_split.images, "_test", test_real_stats,
                )
            return out

    t_start = time.time()
    # Cadences follow the reference's split (run.py:1192-1198, 518): loss
    # curves/console every ~1k iterations, eval + checkpoint_latest every
    # 5k — decoupled so short runs print often without churning eval or
    # checkpoint_latest frequency. Both densify for short runs so they
    # stay observable.
    display_every = args.display_every or min(
        5000, max(50, args.iterations // 10)
    )
    print_every = min(1000, max(10, args.iterations // 40))
    # best_fid survives restarts (the reference restores it from the
    # checkpoint, run.py:900-901; a sidecar avoids checkpoint-layout churn).
    import json as _json

    from nerf_from_image_tpu.utils import fileio

    best_fid = float("inf")
    best_fid_path = os.path.join(checkpoint_dir, "best_fid.json")
    if start_iter > 0 and fileio.file_exists(best_fid_path):
        with fileio.open_file(best_fid_path) as f:
            best_fid = float(_json.load(f)["best_fid"])
        print(f"Restored best_fid {best_fid:.3f}")
    with jax.sharding.set_mesh(mesh):
        for i in range(start_iter, args.iterations):
            key, k = jax.random.split(key)
            # Draws use a 4x stride so dual mode's independent second
            # camera/real/fake draws never collide with the primary ones;
            # the stream stays a pure function of the iteration.
            if i % 2 == 0:
                b2 = (
                    host_batch(4 * i + 2, False)
                    if args.dual_discriminator else None
                )
                state, metrics = g_step(
                    state, host_batch(4 * i, False), k, b2
                )
            else:
                rb2 = fb2 = None
                if args.dual_discriminator:
                    rb2 = host_batch(4 * i + 2, True)
                    fb2 = host_batch(4 * i + 3, False)
                state, metrics = d_step(
                    state, host_batch(4 * i, True),
                    host_batch(4 * i + 1, False), k, rb2, fb2,
                )
            if (
                i == 3
                or (i + 1) % print_every == 0
                or (i + 1) % display_every == 0
            ):
                m = {k_: float(v) for k_, v in metrics.items()}
                imps = args.batch_size * (i + 1 - start_iter) / (
                    time.time() - t_start
                )
                print(f"[{i}] im/s {imps:.2f}", m)
                writer.scalars(m, i, prefix="loss/")
                writer.scalar("img_per_sec", imps, i)
                if (i + 1) % display_every == 0:
                    if fid_eval is not None:
                        fid_m = fid_eval(state)
                        if fid_m.get("fid") is not None:
                            print(f"[{i}] FID {fid_m['fid']:.2f}")
                            writer.scalar("fid", fid_m["fid"], i)
                        for mk, mv in fid_m.items():
                            if mk in ("fid", "first_batch") or mv is None:
                                continue
                            writer.scalar(mk, mv, i)
                        fb = fid_m.get("first_batch") or {}
                        # Eval image grids (reference: run.py:1296-1330).
                        if "rgb" in fb:
                            writer.images("img/eval_rgb", fb["rgb"], i)
                        if "depth" in fb:
                            d = fb["depth"]
                            writer.images(
                                "img/eval_depth",
                                (d / max(float(d.max()), 1e-6))[..., None],
                                i,
                            )
                        if "mask" in fb:
                            writer.images(
                                "img/eval_mask", fb["mask"][..., None], i
                            )
                        if fid_m.get("fid") is not None and fid_m[
                            "fid"
                        ] < best_fid:
                            # Reference keeps a best-FID checkpoint
                            # (run.py:1495-1516).
                            best_fid = fid_m["fid"]
                            ckpt.save_checkpoint(
                                os.path.join(checkpoint_dir,
                                             "checkpoint_best"),
                                {"state": state, "key": key},
                            )
                            with fileio.open_file(
                                best_fid_path, "w"
                            ) as f:
                                _json.dump({"best_fid": best_fid}, f)
                    ckpt.save_checkpoint(
                        os.path.join(checkpoint_dir, "checkpoint_latest"),
                        {"state": state, "key": key},
                    )
            if (i + 1) % 50000 == 0 or i + 1 == args.iterations:
                path = os.path.join(checkpoint_dir, f"checkpoint_{i + 1}")
                ckpt.save_checkpoint(path, {"state": state, "key": key})
                print("Saved checkpoint", path)

    print("Training complete.")


if __name__ == "__main__":
    main()
