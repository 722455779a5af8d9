"""Single-image demo: invert every detected car in one driving frame.

Analog of the reference demo (reference: demo_nusc.py:666-700): given a
named camera frame, load its Mask-RCNN instances, crop each detected car,
run encoder + PnP + N-step inversion per object, and save a side-by-side
composite (input | NOCS coords | reconstruction | depth | normals |
novel view — the reference's panel set, demo_nusc.py:518-540 plus the
random-rotation novel view of eval_kitti_persp.py:631-668) to outputs/.

Usage:
  python demo_driving.py --dataset nusc --inv_manual_input_path <image name>\
      --resume_from <ckpt> --coord_resume_from <encoder ckpt>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from nerf_from_image_tpu.utils.host_env import prepare_xla_flags

prepare_xla_flags()

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


from nerf_from_image_tpu.utils.images import (  # noqa: E402
    depth_panel,
    normals_panel,
    save_image_grid,
)


def main():
    from nerf_from_image_tpu import arguments
    from nerf_from_image_tpu.data.configs import get_dataset_config
    from nerf_from_image_tpu.data.driving import (
        crop_for_inversion,
        get_mask_occ_from_ins,
        load_instance_masks,
    )
    from nerf_from_image_tpu.engine import inversion as inv_mod
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.models.lpips import LPIPS, init_lpips_variables
    from nerf_from_image_tpu.pose import pnp
    from nerf_from_image_tpu.pose.pose import invert_space

    args = arguments.parse_args()
    # The reference demo overrides the driving eval config with the
    # generator's native frame: scene_range 1.4, GREY background
    # (demo_nusc.py:34 — unlike eval_nusc_persp's 3.0/white), so crops
    # feed the p3d-trained encoder directly and no coordinate rescale
    # applies.
    import dataclasses as _dc

    config_ds = _dc.replace(
        get_dataset_config(args.dataset),
        scene_range=1.4,
        white_background=False,
    )

    # Locate the frame + instances through the lite nuScenes reader.
    from nerf_from_image_tpu.data.nusc_lite import NuScenesLite

    nusc = NuScenesLite(args.nusc_version, args.nusc_data_dir)
    filename = os.path.basename(args.inv_manual_input_path or "")
    cam_data = None
    for sd in nusc.sample_data:
        if "CAM" in sd.get("channel", "") and os.path.basename(
            sd["filename"]
        ) == filename:
            cam_data = sd
            break
    assert cam_data is not None, f"frame {filename} not found"

    import imageio.v2 as imageio

    data_path, _, K = nusc.get_sample_data(cam_data["token"])
    img_org = imageio.imread(data_path)[..., :3]
    cam = cam_data["channel"]
    seg_dir = os.path.join(args.nusc_data_dir, "pred_instance", cam)
    stem = os.path.basename(data_path)[:-4]
    preds, ins_masks = load_instance_masks(seg_dir, stem)

    def is_car(i):
        # Two Mask-RCNN dump schemas: the reference's string labels
        # ('car' in preds['labels'][ii], demo_nusc.py:680 /
        # datasets.py:1003) and COCO integer ids ('classes', id 2 = car
        # — the schema of this repo's pred_instance fixtures).
        if "labels" in preds:
            return "car" in str(preds["labels"][i])
        return int(preds["classes"][i]) == 2

    crops = []
    for i in range(len(ins_masks)):
        if not is_car(i):
            continue
        mask_occ = get_mask_occ_from_ins(ins_masks, i)
        sample = crop_for_inversion(
            img_org, mask_occ, None, preds["boxes"][i], K,
            args.resolution, white_bkgd=config_ds.white_background,
        )
        crops.append(sample)
    assert crops, "no cars detected in frame"
    print(f"Inverting {len(crops)} cars")

    model = Generator(
        latent_dim=args.latent_dim,
        scene_range=config_ds.scene_range,
        attention_values=args.attention_values,
        use_sdf=args.use_sdf,
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    if args.resume_from:
        from nerf_from_image_tpu.utils import torch_interop

        if args.resume_from.endswith(".pth"):
            sd = torch_interop.load_torch_checkpoint(
                args.resume_from, key="model_ema"
            )
            variables = jax.tree.map(
                jnp.asarray,
                torch_interop.state_dict_to_variables(dict(variables), sd),
            )
        else:
            from nerf_from_image_tpu.utils import checkpoint as ckpt

            variables = ckpt.generator_variables_from_checkpoint(
                ckpt.load_checkpoint(
                    ckpt.resolve_checkpoint_path(args.resume_from)
                )
            )
        print("Loaded generator from", args.resume_from)

    encoder = BootstrapEncoder(
        latent_dim=model.w_dim,
        separate_backbones=args.inv_use_separate,
    )
    enc_vars = None
    if args.coord_resume_from:
        from nerf_from_image_tpu.utils import checkpoint as ckpt

        enc_vars = ckpt.load_encoder_variables(
            encoder, args.coord_resume_from, args.resolution
        )

    lpips_model = LPIPS()
    lpips_vars = init_lpips_variables(
        lpips_model, jax.random.key(2), args.resolution
    )

    inv_config = inv_mod.InversionConfig(
        steps=args.inv_steps or 30,
        lr_gain_z=args.inv_gain_z,
        loss=args.inv_loss,
        camera_flipped=config_ds.camera_flipped,
        white_background=config_ds.white_background,
    )
    render_config = RenderConfig(
        resolution=args.resolution,
        depth_samples_per_ray=64,
        fine_sampling=True,
        scene_range=config_ds.scene_range,
        white_background=config_ds.white_background,
        query_chunk=args.query_chunk or None,
        plane_dtype=None
        if args.plane_dtype == "float32"
        else args.plane_dtype,
        plane_splat=args.plane_splat,
        merge_mode=args.merge_mode,
    )
    # Demo panels render with SDF normals like the reference
    # (demo_nusc.py:502 compute_normals=args.use_sdf).
    demo_render_config = _dc.replace(
        render_config, compute_normals=args.use_sdf
    )
    invert = jax.jit(
        inv_mod.make_invert_fn(
            inv_config, render_config, model, variables, lpips_model,
            lpips_vars,
        ),
        static_argnames=("n_steps",),
    )
    z_avg = model.apply(variables, jax.random.key(3), 10000,
                        method="average_w")

    rows = []
    np_rng = np.random.default_rng(543)
    for i, sample in enumerate(crops):
        target = jnp.asarray(sample["img"])[None]
        Kc = sample["K"]
        focal = jnp.asarray([Kc[0, 0]])

        if enc_vars is not None:
            coords, mask_pred, w_pred = encoder.apply(
                enc_vars, target[..., :3], deterministic=True
            )
            coords = coords * (config_ds.scene_range / 1.4)
            w2c, err = pnp.compute_pose_pnp_known_k(
                coords, mask_pred, jnp.asarray(Kc)[None]
            )
            init_pose = invert_space(w2c)
            # Regressed w [B, 1, w_dim] -> per-layer ws (w-space latent;
            # a 2-dim input would be re-mapped through the mapping net).
            z0 = (
                jnp.broadcast_to(
                    w_pred, (1, model.num_ws, w_pred.shape[-1])
                )
                / inv_config.lr_gain_z
            )
            from nerf_from_image_tpu.utils.images import coords_panel

            coords_vis = coords_panel(
                np.asarray(coords)[0], np.asarray(mask_pred)[0],
                config_ds.scene_range, False,
            )
        else:
            init_pose = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).at[:, 2, 3].set(
                3.0
            )
            z0 = jnp.broadcast_to(
                z_avg / inv_config.lr_gain_z, (1,) + z_avg.shape[1:]
            )
            coords_vis = np.zeros_like(np.asarray(target)[0])

        pose_params = inv_mod.pose_params_from_matrix(
            init_pose, focal, config_ds.camera_flipped
        )
        z_f, pose_f, _ = invert(
            z0, pose_params, target, jax.random.key(10 + i),
            n_steps=inv_config.steps,
        )
        cam_f, focal_f = inv_mod.build_camera(
            pose_f, config_ds.camera_flipped
        )
        # Full-patch render, no principal-point offset — the reference
        # demo uses target_center=None throughout (demo_nusc.py:951).
        out, _ = render(
            demo_render_config, model, variables, cam_f, focal_f,
            z_f * inv_config.lr_gain_z, force_no_cam_grad=True,
        )
        # Novel view: the recovered camera perturbed by a random rotation
        # (reference: eval_kitti_persp.py:631-645; demo appends the
        # novel-view recon panel, demo_nusc.py:528-534).
        from scipy.spatial.transform import Rotation as _R

        angle_lim = np.pi * 0.2
        rotvec = np_rng.uniform(-angle_lim, angle_lim, size=3)
        w2c_p = np.array(invert_space(cam_f))
        w2c_p[0, :3, :3] = w2c_p[0, :3, :3] @ _R.from_rotvec(
            rotvec
        ).as_matrix().astype(np.float32)
        cam_p = invert_space(jnp.asarray(w2c_p))
        out_p, _ = render(
            demo_render_config, model, variables, cam_p, focal_f,
            z_f * inv_config.lr_gain_z, force_no_cam_grad=True,
        )
        mask0 = np.asarray(out.mask)[0]
        depth_vis = depth_panel(
            np.asarray(out.depth)[0], mask0, config_ds.white_background
        )
        normals_vis = (
            normals_panel(np.asarray(out.normals)[0], mask0)
            if out.normals is not None
            else np.zeros_like(depth_vis)
        )
        rows.append(
            [
                np.asarray(target)[0, ..., :3],
                coords_vis,
                np.asarray(jnp.clip(out.rgb[0, ..., :3], -1, 1)),
                depth_vis,
                normals_vis,
                np.asarray(jnp.clip(out_p.rgb[0, ..., :3], -1, 1)),
            ]
        )

    out_path = os.path.join(
        "outputs", f"demo_{args.dataset}_{stem}.png"
    )
    save_image_grid(rows, out_path)


if __name__ == "__main__":
    main()
