"""Inversion evaluation: per-checkpoint metrics + consolidated reports.

JAX re-design of the reference's evaluate_inversion + report consolidation
(reference: run.py:2020-2195, 2338-2404): at each checkpoint step the
recovered (w, pose) is re-rendered from the front view and the paired novel
view, and PSNR / SSIM / IoU / LPIPS / rotation error / Inception activations
are accumulated. Everything numeric runs on device in one jit program per
batch; the report is a host-side dict of numpy arrays written as .npz + a
human-readable .txt (the reference's report.pth/report.txt analog).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.engine.inversion import (
    InversionConfig,
    PoseParams,
    build_camera,
)
from nerf_from_image_tpu.engine.render import RenderConfig, render
from nerf_from_image_tpu.metrics import image as image_metrics
from nerf_from_image_tpu.pose.pose import rotation_matrix_distance


def make_eval_fn(
    config: InversionConfig,
    render_config: RenderConfig,
    model,
    generator_variables,
    lpips_model,
    lpips_variables,
    inception_model=None,
    inception_variables=None,
    has_mask: bool = True,
):
    """Builds the jittable per-batch checkpoint evaluation.

    Returns eval_fn(z, pose_params, target_img, gt_cam2world, perm_batch)
    -> dict of per-sample metrics (+ 2048-d activations when inception is
    provided).
    """

    def render_view(z, cam, focal, center, bbox):
        out, _ = render(
            render_config,
            model,
            generator_variables,
            cam,
            focal,
            z * config.lr_gain_z,
            center=center,
            bbox=bbox,
            force_no_cam_grad=True,
        )
        return out

    def eval_fn(
        z,
        pose_params: PoseParams,
        target_img,
        gt_cam2world=None,
        perm_pose=None,
        perm_focal=None,
        perm_target=None,
        center=None,
        bbox=None,
        perm_center=None,
        perm_bbox=None,
    ) -> Dict[str, jnp.ndarray]:
        cam, focal = build_camera(pose_params, config.camera_flipped)
        out = render_view(z, cam, focal, center, bbox)
        pred = jnp.clip(out.rgb[..., :3], -1.0, 1.0)
        target = target_img[..., :3]

        res: Dict[str, jnp.ndarray] = {}
        res["psnr"] = image_metrics.psnr(
            pred / 2 + 0.5, target / 2 + 0.5, reduction="none"
        )
        res["ssim"] = image_metrics.ssim(
            pred / 2 + 0.5, target / 2 + 0.5, reduction="none"
        )
        if has_mask and target_img.shape[-1] > 3:
            res["iou"] = image_metrics.iou(
                out.mask, target_img[..., 3], reduction="none"
            )
        res["lpips"] = lpips_model.apply(
            lpips_variables, pred, target
        ).reshape(-1)
        if gt_cam2world is not None:
            res["rot_error"] = rotation_matrix_distance(cam, gt_cam2world)
        if inception_model is not None:
            res["inception_activations_front"] = inception_model.apply(
                inception_variables, pred / 2 + 0.5
            )

        if perm_pose is not None:
            out_r = render_view(z, perm_pose, perm_focal, perm_center,
                                perm_bbox)
            pred_r = jnp.clip(out_r.rgb[..., :3], -1.0, 1.0)
            if perm_target is not None:
                res["psnr_random"] = image_metrics.psnr(
                    pred_r / 2 + 0.5, perm_target[..., :3] / 2 + 0.5,
                    reduction="none",
                )
                res["ssim_random"] = image_metrics.ssim(
                    pred_r / 2 + 0.5, perm_target[..., :3] / 2 + 0.5,
                    reduction="none",
                )
                res["lpips_random"] = lpips_model.apply(
                    lpips_variables, pred_r, perm_target[..., :3]
                ).reshape(-1)
            if inception_model is not None:
                res["inception_activations_random"] = inception_model.apply(
                    inception_variables, pred_r / 2 + 0.5
                )
        return res

    return eval_fn


class InversionReport:
    """Accumulates per-checkpoint metric batches and writes the consolidated
    report (.npz tensors + .txt summary; reference: run.py:2338-2404)."""

    def __init__(self, checkpoint_steps, metric_notes=None):
        self.checkpoint_steps = list(checkpoint_steps)
        self.items: Dict[int, Dict[str, list]] = {
            step: {} for step in self.checkpoint_steps
        }
        # metric prefix -> note appended to its summary lines, e.g.
        # {"lpips": "(RANDOM-FEATURE — not metric grade)"} when LPIPS runs
        # without pretrained weights. Keeps a report produced in a
        # zero-weight environment visibly non-comparable.
        self.metric_notes: Dict[str, str] = dict(metric_notes or {})

    def merge_notes_on_resume(self, current_notes: Dict[str, str]) -> None:
        """Reconciles saved metric notes with the resuming environment's.

        Keeps the stricter (present) stamp in both directions: rows already
        accumulated under a note keep it even if the environment improved
        on resume, and metric-grade rows are marked as mixed when the
        resuming environment adds a note (or drops one) — so no row's
        provenance is ever silently upgraded.
        """
        for pfx, note in current_notes.items():
            old = self.metric_notes.get(pfx)
            if old and old != note:
                note = f"{old} + resumed with {note}"
            elif not old:
                # Saved rows were metric grade (no note); rows from here
                # on are not. Mark the mixed provenance so the earlier
                # metric-grade rows aren't mislabeled by the plain stamp.
                note = f"{note} (mixed: metric-grade rows before resume)"
            self.metric_notes[pfx] = note
        for pfx, old in list(self.metric_notes.items()):
            if pfx not in current_notes and "resumed" not in old:
                self.metric_notes[pfx] = (
                    f"{old} (mixed: resumed at metric grade)"
                )

    def add(self, step: int, metrics: Dict[str, Any], recovered=None):
        item = self.items[step]
        for k, v in metrics.items():
            item.setdefault(k, []).append(np.asarray(v))
        if recovered is not None:
            for k, v in recovered.items():
                if v is not None:
                    item.setdefault(k, []).append(np.asarray(v))

    def consolidated(self) -> Dict[int, Dict[str, np.ndarray]]:
        return {
            step: {
                k: np.concatenate(v) if np.ndim(v[0]) > 0 else np.asarray(v)
                for k, v in item.items()
            }
            for step, item in self.items.items()
        }

    def summary(self, fid_stats_real=None) -> str:
        from nerf_from_image_tpu.metrics import fid as fid_mod

        lines = []
        for step, item in self.consolidated().items():
            lines.append(f"[checkpoint step {step}]")
            for k, v in sorted(item.items()):
                if k.startswith("inception_"):
                    continue
                if k in ("ws", "z0", "R", "s", "t2"):
                    continue
                note = next(
                    (
                        f" {n}"
                        for pfx, n in self.metric_notes.items()
                        if k == pfx or k.startswith(pfx + "_")
                    ),
                    "",
                )
                lines.append(f"  {k}: {float(np.mean(v)):.5f}{note}")
            if fid_stats_real is not None:
                for which in ("front", "random"):
                    key = f"inception_activations_{which}"
                    if key in item and len(item[key]) > 1:
                        mu, sigma = fid_mod.calculate_stats(
                            jnp.asarray(item[key])
                        )
                        fid_val = float(
                            fid_mod.frechet_distance(
                                mu, sigma, fid_stats_real[0], fid_stats_real[1]
                            )
                        )
                        lines.append(f"  fid_{which}: {fid_val:.5f}")
        return "\n".join(lines)

    def save(self, path_prefix: str, fid_stats_real=None):
        # GCS-aware (gs:// report dirs like the reference's open_file,
        # lib/utils.py:23-56); local paths stay dependency-free.
        from nerf_from_image_tpu.utils import fileio

        fileio.mkdir(os.path.dirname(path_prefix) or ".")
        flat = {}
        for step, item in self.consolidated().items():
            for k, v in item.items():
                flat[f"step{step}/{k}"] = v
        if self.metric_notes:
            # Persist notes alongside the tensors so a resumed run keeps
            # e.g. the RANDOM-FEATURE LPIPS stamp of its accumulated
            # columns even if the resuming environment differs.
            flat["__metric_notes__"] = np.asarray(
                json.dumps(self.metric_notes)
            )
        # Write-then-rename: a crash mid-write must not corrupt the
        # resume checkpoint of a multi-hour inversion run (load() would
        # raise on a truncated zip and lose the resume cursor).
        tmp = path_prefix + ".tmp.npz"  # np.savez appends .npz otherwise
        with fileio.open_file(tmp, "wb") as f:
            np.savez(f, **flat)
        fileio.replace_file(tmp, path_prefix + ".npz")
        with fileio.open_file(path_prefix + ".txt", "w") as f:
            f.write(self.summary(fid_stats_real) + "\n")

    def num_samples(self, metric: str = "psnr") -> int:
        """Images accumulated so far at the first checkpoint (resume
        cursor; reference resumes inversion by index, run.py:1858-1871)."""
        step0 = self.items[self.checkpoint_steps[0]]
        if metric not in step0:
            return 0
        return int(sum(np.size(v) for v in step0[metric]))

    @classmethod
    def load(cls, path_prefix: str) -> "InversionReport":
        """Rebuilds a report from a saved .npz checkpoint (local or gs://)."""
        import io as _io

        from nerf_from_image_tpu.utils import fileio

        with fileio.open_file(path_prefix + ".npz", "rb") as f:
            # Buffer fully: np.load reads the zip lazily, and the file
            # object closes with the context manager.
            data = np.load(_io.BytesIO(f.read()))
        steps = sorted(
            {
                int(k.split("/", 1)[0][len("step"):])
                for k in data.files
                if "/" in k
            }
        )
        report = cls(steps)
        for key in data.files:
            if key == "__metric_notes__":
                report.metric_notes = json.loads(str(data[key]))
                continue
            step_str, metric = key.split("/", 1)
            report.items[int(step_str[len("step"):])].setdefault(
                metric, []
            ).append(data[key])
        return report
