"""Hybrid inversion driver (the reference's --run_inversion path).

Loads a trained generator checkpoint (orbax, or a reference .pth via
torch interop), runs the bootstrap encoder for a first guess, estimates
poses with on-device PnP, refines (w, pose) by N jit-compiled Adam steps
through the renderer, and writes the metrics report.

Example (smoke, random weights):
  python invert.py --dataset synthetic --batch_size 4 --resolution 32 \
      --inv_steps 5 --max_images 8 --latent_dim 64
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
    from nerf_from_image_tpu.data.loaders import get_train_overrides, load_dataset
    from nerf_from_image_tpu.data.splits import (
        compute_eval_indices,
        compute_view_perm,
    )
    from nerf_from_image_tpu.engine import evaluate as eval_mod
    from nerf_from_image_tpu.engine import inversion as inv_mod
    from nerf_from_image_tpu.engine.render import RenderConfig
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.models.lpips import LPIPS, init_lpips_variables
    from nerf_from_image_tpu.pose import pnp
    from nerf_from_image_tpu.utils import checkpoint as ckpt

    from nerf_from_image_tpu.parallel import mesh as mesh_mod

    args = arguments.parse_args()
    mesh_mod.maybe_init_multihost(args)
    if args.inv_train_coord_only:
        # Train the bootstrap encoder and exit (reference: run.py:1806-1808).
        # Encoder training lives in its own driver here.
        import train_encoder

        train_encoder.main()
        return
    if args.dataset == "autodetect":
        # Dataset from the checkpoint/experiment name (reference:
        # run.py:62-64).
        from nerf_from_image_tpu.data.loaders import autodetect_dataset

        assert args.resume_from, "--dataset or --resume_from required"
        args.dataset = autodetect_dataset(args.resume_from)
        print("Autodetected dataset:", args.dataset)
    overrides = get_train_overrides(args.dataset)
    # The generator must be built with the same per-dataset presets the
    # training driver applied (CARLA checkpoints carry the viewdir
    # branch; supervise_alpha sizes nothing here but keeps names aligned).
    args.use_viewdir = args.use_viewdir or overrides.use_viewdir

    config_ds, train_split, train_eval_split, test_split = load_dataset(
        args.dataset,
        args.data_path,
        resolution=args.resolution,
        augment_p=0.0,
        need_test=args.inv_use_testset or overrides.inv_use_testset,
        max_images=args.max_images,
        imagenet_testset=args.inv_use_imagenet_testset,
    )
    target_split = test_split if test_split is not None else train_eval_split

    model = Generator(
        latent_dim=args.latent_dim,
        scene_range=config_ds.scene_range,
        attention_values=args.attention_values,
        use_viewdir=args.use_viewdir,
        use_sdf=args.use_sdf,
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    if args.resume_from:
        ckpt_path = args.resume_from
        if ckpt_path.endswith(".pth"):
            from nerf_from_image_tpu.utils import torch_interop

            sd = torch_interop.load_torch_checkpoint(ckpt_path, key="model_ema")
            variables = jax.tree.map(
                jnp.asarray,
                torch_interop.state_dict_to_variables(dict(variables), sd),
            )
            print("Loaded reference checkpoint", ckpt_path)
        else:
            ckpt_path = ckpt.resolve_checkpoint_path(ckpt_path)
            variables = ckpt.generator_variables_from_checkpoint(
                ckpt.load_checkpoint(ckpt_path)
            )
            print("Loaded checkpoint", ckpt_path)

    lpips_model = LPIPS()
    lpips_vars = init_lpips_variables(
        lpips_model, jax.random.key(1), args.resolution
    )

    # Bootstrap encoder: latent + pose first guess (reference:
    # run.py:1961-1984 — z from the regressed w, pose from PnP on the
    # regressed coordinate map with train-set focal guesses).
    enc_vars = None
    encoder_fwd = None
    if args.coord_resume_from:
        from nerf_from_image_tpu.models.encoder import BootstrapEncoder

        encoder = BootstrapEncoder(
            latent_dim=model.w_dim,
            separate_backbones=args.inv_use_separate,
        )
        enc_vars = ckpt.load_encoder_variables(
            encoder, args.coord_resume_from, args.resolution
        )
        encoder_fwd = jax.jit(
            lambda v, x: encoder.apply(v, x, deterministic=True)
        )
        print("Loaded encoder from", args.coord_resume_from)
    focal_guesses = pnp.get_focal_guesses(train_split.focal_length)

    # Optional FID over the inversion outputs (reference: run.py:2355-2404).
    # Weights gate as in train.py: NFI_INCEPTION_WEIGHTS points to a
    # pytorch-fid pt_inception checkpoint.
    inception = None
    inc_vars = None
    inception_weights = os.environ.get("NFI_INCEPTION_WEIGHTS")
    if args.inv_export_demo_sample:
        # Demo mode skips FID accumulation (reference: run.py:2093-2099).
        inception_weights = None
    if inception_weights and os.path.exists(inception_weights):
        from nerf_from_image_tpu.models.inception import (
            FIDInceptionV3,
            inception_state_to_variables,
        )
        from nerf_from_image_tpu.utils import torch_interop

        inception = FIDInceptionV3()
        inc_vars = inception.init(
            jax.random.key(5), jnp.zeros((1, 64, 64, 3))
        )
        inc_vars = jax.tree.map(
            jnp.asarray,
            inception_state_to_variables(
                dict(inc_vars),
                torch_interop.load_torch_checkpoint(inception_weights),
            ),
        )
        print("FID enabled (inception weights:", inception_weights + ")")

    n_steps = args.inv_steps or (10 if args.inv_gain_z >= 10 else 30)
    if args.inv_encoder_only:
        # Encoder-only evaluation: no optimization at all (reference:
        # run.py:1823-1825 checkpoint_steps = [0]).
        n_steps = 0
    checkpoint_steps = [0, n_steps] if n_steps > 0 else [0]

    inv_config = inv_mod.InversionConfig(
        steps=n_steps,
        lr_gain_z=args.inv_gain_z,
        loss=args.inv_loss,
        optimize_pose=not (
            args.inv_no_optimize_pose or overrides.inv_no_optimize_pose
        ),
        camera_flipped=config_ds.camera_flipped,
        is_ortho=config_ds.is_ortho,
        white_background=config_ds.white_background,
    )
    # Without fine sampling the reference renders 128 samples/ray
    # (run.py:511-514) and the optimization loop additionally multiplies by
    # 4 (ray_multiplier, run.py:2271) while eval renders stay at 128
    # (ParallelModel default, run.py:576).
    render_config = RenderConfig(
        resolution=args.resolution,
        depth_samples_per_ray=64 if args.fine_sampling else 512,
        fine_sampling=args.fine_sampling,
        scene_range=config_ds.scene_range,
        white_background=config_ds.white_background,
        use_viewdir=args.use_viewdir,
        query_chunk=args.query_chunk or None,
        plane_dtype=None
        if args.plane_dtype == "float32"
        else args.plane_dtype,
        plane_splat=args.plane_splat,
        merge_mode=args.merge_mode,
    )

    # SPMD data parallelism: params replicated, batch leaves sharded over
    # the mesh 'data' axis — the analog of the reference's DataParallel
    # inversion batch scaling (run.py:1757).

    n_dev = args.chips or jax.device_count()
    mesh = mesh_mod.make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
    variables = mesh_mod.replicate(mesh, variables)
    lpips_vars = mesh_mod.replicate(mesh, lpips_vars)
    if enc_vars is not None:
        enc_vars = mesh_mod.replicate(mesh, enc_vars)
    if inc_vars is not None:
        inc_vars = mesh_mod.replicate(mesh, inc_vars)

    invert = jax.jit(
        inv_mod.make_invert_fn(
            inv_config, render_config, model, variables, lpips_model,
            lpips_vars,
        ),
        static_argnames=("n_steps",),
    )
    import dataclasses as _dc0

    eval_render_config = (
        render_config
        if args.fine_sampling
        else _dc0.replace(render_config, depth_samples_per_ray=128)
    )
    eval_fn = jax.jit(
        eval_mod.make_eval_fn(
            inv_config, eval_render_config, model, variables, lpips_model,
            lpips_vars, inception_model=inception,
            inception_variables=inc_vars, has_mask=config_ds.has_mask,
        )
    )

    # Average w init (reference: run.py:1852-1853).
    z_avg = model.apply(
        variables, jax.random.key(2), 10000, method="average_w"
    )

    eval_indices = compute_eval_indices(target_split)
    eval_perm = compute_view_perm(
        eval_indices,
        config_ds.views_per_object_test or config_ds.views_per_object,
    )
    if args.max_num_samples:
        eval_indices = eval_indices[: args.max_num_samples]
        eval_perm = eval_perm[: len(eval_indices)]

    demo_mode = args.inv_export_demo_sample
    if args.inv_manual_input_path:
        # Demo inference on an externally supplied image: mask + crop it
        # and splice it in as sample 0 (reference: run.py:68-74,
        # data/loaders.py:228-237 insert_manual_image).
        from nerf_from_image_tpu.data.loaders import (
            get_coco_mapping,
            load_manual_image,
        )

        manual = load_manual_image(
            args.inv_manual_input_path,
            args.resolution,
            get_coco_mapping().get(args.dataset),
        )
        target_split.images = np.array(target_split.images)
        # Keep as many channels as the split holds (mask-less datasets
        # store plain RGB).
        nc = target_split.images.shape[-1]
        target_split.images[0] = manual["img"][..., :nc]
        if target_split.bbox is not None:
            target_split.bbox = np.array(target_split.bbox)
            target_split.bbox[0] = manual["normalized_bbox"]
        eval_indices = np.asarray([0])
        eval_perm = eval_perm[:1]
    elif demo_mode:
        # Randomized demo sample order (reference: run.py:1817-1821).
        shuffle_idx = np.random.RandomState(1).permutation(len(eval_indices))
        eval_indices = eval_indices[shuffle_idx]
        eval_perm = eval_perm[shuffle_idx]

    split_tag = "_imagenettest" if args.inv_use_imagenet_testset else ""
    report_dir = os.path.join(args.root_path, "reports",
                              f"inv_{args.dataset}{split_tag}")
    report_ckpt_prefix = os.path.join(report_dir, "report_checkpoint")
    from nerf_from_image_tpu.models.lpips import lpips_metric_grade

    metric_notes = (
        {}
        if lpips_metric_grade()
        else {"lpips": "(RANDOM-FEATURE — not metric grade)"}
    )
    report = eval_mod.InversionReport(checkpoint_steps, metric_notes)
    resume_idx = 0
    from nerf_from_image_tpu.utils import fileio

    if not demo_mode and fileio.file_exists(report_ckpt_prefix + ".npz"):
        # Resumable reports (reference: run.py:1858-1871, 2329-2336).
        report = eval_mod.InversionReport.load(report_ckpt_prefix)
        # Merge notes, keeping the stricter (present) one when the saved
        # run's environment disagrees with this one: a report that
        # accumulated ANY random-feature LPIPS rows must keep that stamp
        # even if NFI_LPIPS_WEIGHTS is set on resume (and vice versa the
        # current environment's stamp is added for the rows to come).
        report.merge_notes_on_resume(metric_notes)
        resume_idx = report.num_samples()
        print(f"Resuming inversion report at image {resume_idx}")
    # Reference inversion batch: batch_size // 4 per device
    # (run.py:1757 `batch_size // 4 * len(gpu_ids)`). Using the raw
    # training batch size quadruples the live plane-gradient temps and
    # OOMs a 16G chip at the default --batch_size 32. The batch leaves are
    # sharded over the mesh, so the per-device share stays batch_size//4.
    bs = max(1, args.batch_size // 4) * n_dev
    key = jax.random.key(3)
    t0 = time.time()

    # Image renderer for demo composites and TB grids: front/novel views
    # with normal maps (reference: run.py:2040-2159).
    import dataclasses as _dc

    from nerf_from_image_tpu.engine.render import render as render_fn
    from nerf_from_image_tpu.utils import tb

    demo_config = _dc.replace(
        eval_render_config, compute_normals=bool(args.use_sdf)
    )

    def _demo_render(z, cam, focal, center=None, bbox=None):
        out, _ = render_fn(
            demo_config, model, variables, cam, focal,
            z * inv_config.lr_gain_z, center=center, bbox=bbox,
            force_no_cam_grad=True,
        )
        return out

    demo_render = jax.jit(_demo_render)
    # TensorBoard sink for the inversion (reference: run.py:1779-1783,
    # 2104-2131 — scalar loss curves + first-batch image grids).
    writer = tb.Logger(os.path.join(report_dir, "tb"))

    for start in range(resume_idx, len(eval_indices), bs):
        idx = eval_indices[start : start + bs]
        n_real = len(idx)
        if n_real < bs:
            # Ragged tail: pad by repeating the last index and slice the
            # padded rows off every metric (the reference drops to bs=1 and
            # recompiles; padding keeps one static shape).
            idx = np.concatenate([idx, np.repeat(idx[-1:], bs - n_real)])
        idx_perm = eval_perm[start : start + bs]
        if len(idx_perm) < bs:
            idx_perm = np.concatenate(
                [idx_perm, np.repeat(idx_perm[-1:], bs - len(idx_perm))]
            )
        sel = target_split.select(idx)
        # Novel-view (perm) split: for p3d on the test set the reference
        # draws perm poses from the TRAINING pose distribution (test pose
        # distribution unavailable — run.py:1895-1906); otherwise the
        # eval split's own perm view is used.
        perm_split = (
            train_eval_split
            if (test_split is not None and "p3d" in args.dataset
                and train_eval_split is not None)
            else target_split
        )
        sel_perm = perm_split.select(idx_perm)
        shard = lambda x: (
            None if x is None else mesh_mod.shard_batch(mesh, jnp.asarray(x))
        )
        # Optimization target (reference run.py:1920-1944): on the train
        # split outside demo mode the reference optimizes against the
        # UNCROPPED train image (full-patch render), while metrics
        # compare the cropped train-eval view rendered through its
        # center/bbox — the same fitted pose satisfies both because the
        # bbox remap renders exactly that crop of the full view. Demo
        # mode and the test set optimize against the (cropped) eval
        # image directly with full-patch eval renders.
        if test_split is None and not demo_mode:
            target_img = shard(train_split.select(idx).images)
            front_center = shard(sel.center)
            front_bbox = shard(sel.bbox)
        else:
            target_img = shard(sel.images)
            front_center = front_bbox = None
        target_img_fid = shard(sel.images)
        pose_gt = shard(sel.tform_cam2world)
        focal_gt = shard(sel.focal_length)
        perm_pose = shard(sel_perm.tform_cam2world)
        perm_focal = shard(sel_perm.focal_length)
        # Novel-view recon metrics exist only when the dataset has
        # multiple registered views per object (reference run.py:2160);
        # with views == 1 the perm render feeds FID activations only.
        views_per_object = (
            config_ds.views_per_object_test
            if test_split is not None
            else config_ds.views_per_object
        )
        perm_imgs = (
            shard(sel_perm.images)
            if (views_per_object or 1) > 1
            else None
        )
        perm_center = shard(sel_perm.center)
        perm_bbox = shard(sel_perm.bbox)

        # Init: regressed latent + PnP pose when the bootstrap encoder is
        # loaded; average w + ground-truth-frame pose otherwise.
        z0 = z_avg / inv_config.lr_gain_z
        z0 = jnp.broadcast_to(z0, (bs,) + z0.shape[1:])
        init_pose, init_focal = pose_gt, focal_gt
        if enc_vars is not None:
            coords, mask_pred, w_pred = encoder_fwd(
                enc_vars, target_img[..., :3]
            )
            if coords is not None:
                est_pose, est_focal, _ = pnp.estimate_poses_batch(
                    coords, mask_pred, focal_guesses
                )
                init_pose = est_pose
                if est_focal is not None:
                    init_focal = est_focal
            if w_pred is not None:
                # Encoder returns w [B, 1, w_dim]; broadcast to the split
                # per-layer ws layout.
                z0 = (
                    jnp.broadcast_to(w_pred, (bs,) + z_avg.shape[1:])
                    / inv_config.lr_gain_z
                )
        if args.inv_no_split:
            # Optimize a single w instead of split per-layer ws
            # (reference: run.py:1980-1981).
            z0 = jnp.mean(z0, axis=1, keepdims=True)
        pose_params = inv_mod.pose_params_from_matrix(
            init_pose, init_focal, config_ds.camera_flipped
        )
        # Pin the optimizable leaves to the data-sharded layout so the
        # whole scan partitions over the mesh.
        z0 = mesh_mod.shard_batch(mesh, z0)
        pose_params = mesh_mod.shard_batch(mesh, pose_params)

        def take_real(tree):
            """Drops padded tail rows before accumulation."""
            return {
                k: np.asarray(v)[:n_real] for k, v in tree.items()
                if v is not None
            }

        recovered = take_real({
            "ws": np.asarray(z0 * inv_config.lr_gain_z),
            "R": np.asarray(pose_params.q),
            "s": np.asarray(pose_params.s),
            "t2": np.asarray(pose_params.t2),
        })
        metrics0 = eval_fn(
            z0, pose_params, target_img_fid, pose_gt,
            perm_pose, perm_focal, perm_imgs,
            center=front_center, bbox=front_bbox,
            perm_center=perm_center, perm_bbox=perm_bbox,
        )
        report.add(0, take_real(jax.device_get(metrics0)), recovered)

        first_batch = start == resume_idx
        if first_batch:
            # First-batch image grids at checkpoint step 0 (reference:
            # run.py:2104-2110).
            writer.images("img/ref", np.asarray(target_img_fid[..., :3]), 0)
            cam0, focal0 = inv_mod.build_camera(
                pose_params, config_ds.camera_flipped
            )
            out0 = demo_render(z0, cam0, focal0)
            writer.images(
                "img/recon_front",
                np.asarray(jnp.clip(out0.rgb[..., :3], -1, 1)), 0,
            )

        z_f, pose_f = z0, pose_params
        if n_steps > 0:
            key, k = jax.random.split(key)
            z_f, pose_f, losses = invert(
                z0, pose_params, target_img, k, n_steps=n_steps
            )
            metrics_n = eval_fn(
                z_f, pose_f, target_img_fid, pose_gt,
                perm_pose, perm_focal, perm_imgs,
                center=front_center, bbox=front_bbox,
                perm_center=perm_center, perm_bbox=perm_bbox,
            )
            report.add(n_steps, take_real(jax.device_get(metrics_n)),
                       take_real({
                           "ws": np.asarray(z_f * inv_config.lr_gain_z),
                           "R": np.asarray(pose_f.q),
                           "s": np.asarray(pose_f.s),
                           "t2": np.asarray(pose_f.t2),
                       }))
            if first_batch:
                # Per-step loss curve + final grids (reference:
                # run.py:2104-2131, loss scalars around :2290-2304).
                for t, lv in enumerate(np.asarray(losses).reshape(-1)):
                    writer.scalar("loss/inversion", float(lv), t)
                cam_fv, focal_fv = inv_mod.build_camera(
                    pose_f, config_ds.camera_flipped
                )
                out_fv = demo_render(z_f, cam_fv, focal_fv)
                writer.images(
                    "img/recon_front",
                    np.asarray(jnp.clip(out_fv.rgb[..., :3], -1, 1)),
                    n_steps,
                )
                writer.images(
                    "img/mask_front",
                    np.asarray(jnp.clip(out_fv.mask, 0, 1))[..., None],
                    n_steps,
                )
                if out_fv.normals is not None:
                    writer.images(
                        "img/normals_front",
                        np.asarray(jnp.clip(out_fv.normals, -1, 1)),
                        n_steps,
                    )
                writer.flush()
        if demo_mode:
            # Side-by-side composite at the final checkpoint step, first
            # batch only (reference: run.py:2058-2159, 2325-2327).
            from nerf_from_image_tpu.utils.images import (
                normals_panel,
                save_image_grid,
            )

            cam_f, focal_f = inv_mod.build_camera(
                pose_f, config_ds.camera_flipped
            )
            out_f = demo_render(z_f, cam_f, focal_f)
            # Novel view through the perm view's crop (reference
            # run.py:2126-2130 renders the random view with
            # target_center_perm/target_bbox_perm).
            out_n = demo_render(
                z_f, perm_pose, perm_focal, perm_center, perm_bbox
            )
            rows = []
            for b in range(n_real):
                panels = [np.asarray(target_img)[b, ..., :3]]
                if enc_vars is not None and coords is not None:
                    from nerf_from_image_tpu.utils.images import (
                        coords_panel,
                    )

                    panels.append(
                        coords_panel(
                            np.asarray(coords)[b],
                            np.asarray(mask_pred)[b],
                            config_ds.scene_range,
                            config_ds.white_background,
                        )
                    )
                panels.append(
                    np.asarray(jnp.clip(out_f.rgb[b, ..., :3], -1, 1))
                )
                if out_f.normals is not None:
                    panels.append(
                        normals_panel(out_f.normals[b], out_f.mask[b])
                    )
                panels.append(
                    np.asarray(jnp.clip(out_n.rgb[b, ..., :3], -1, 1))
                )
                if out_n.normals is not None:
                    panels.append(
                        normals_panel(out_n.normals[b], out_n.mask[b])
                    )
                rows.append(panels)
            out_fname = (
                f"demo_manual_{args.dataset}_{n_steps}it.png"
                if args.inv_manual_input_path
                else f"sample_{args.dataset}_{n_steps}it.png"
            )
            save_image_grid(rows, os.path.join("outputs", out_fname))
            break

        done = start + n_real
        print(
            f"[{done}/{len(eval_indices)}] "
            f"{(time.time() - t0) / max(done - resume_idx, 1):.3f} s/img"
        )
        if done % 512 < bs and done < len(eval_indices):
            # Resumable report checkpoint every ~512 images (reference:
            # run.py:2329-2336).
            report.save(report_ckpt_prefix)

    if demo_mode:
        # No consolidated report in demo mode (reference: run.py:2338).
        return

    # Real-image FID stats for the front/random recon FIDs (reference:
    # run.py:2355-2404) — only meaningful with real Inception weights.
    fid_stats_real = None
    if inception is not None:
        from nerf_from_image_tpu.engine import gan_eval

        fid_stats_real = gan_eval.compute_real_fid_stats(
            inception, inc_vars, train_eval_split.images[..., :3]
        )

    report.save(os.path.join(report_dir, "report"), fid_stats_real)
    print(report.summary(fid_stats_real))
    print("Report written to", report_dir)


if __name__ == "__main__":
    main()
