"""Top-level dataset loading: dispatch + per-dataset training overrides.

Re-design of the reference loader layer (reference: data/loaders.py:90-501):
`load_dataset(name, ...)` returns (DatasetConfig, train, train_eval, test)
DatasetSplits with the reference's exact materialization semantics (highres
2x + avg-pool pair when ADA is on, crop=True for the eval split, CUB ortho
focal/bbox clearing, train bbox=None).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

from nerf_from_image_tpu.data import image_ops
from nerf_from_image_tpu.data.configs import DatasetConfig, get_dataset_config
from nerf_from_image_tpu.data.splits import DatasetSplit


@dataclasses.dataclass
class TrainOverrides:
    """Per-dataset hyperparameter presets (reference: data/loaders.py:90-123)."""

    iterations: int = 300000
    disable_stylegan_noise: bool = True
    supervise_alpha: bool = False
    augment_p: float = 0.0
    augment_ada: bool = False
    inv_use_testset: bool = False
    inv_no_optimize_pose: bool = False
    use_viewdir: bool = False
    r1: float = 5.0


def get_train_overrides(dataset: str) -> TrainOverrides:
    o = TrainOverrides()
    if dataset == "cub":
        o.iterations = 200000
        o.disable_stylegan_noise = False
        o.supervise_alpha = True
        o.augment_p = 0.8
        o.augment_ada = True
        o.inv_use_testset = True
    if dataset.startswith("imagenet"):
        o.supervise_alpha = True
        o.augment_p = 0.8
        o.augment_ada = True
    if dataset == "imagenet_elephant":
        o.iterations = 200000
        o.disable_stylegan_noise = False
        o.r1 = 10.0
    if dataset.startswith("p3d"):
        o.supervise_alpha = True
        o.augment_p = 0.8
        o.augment_ada = True
        o.inv_use_testset = True
    if dataset == "carla":
        o.use_viewdir = True
        o.augment_p = 0.8
        o.augment_ada = True
    if dataset.startswith("shapenet"):
        o.inv_use_testset = True
        o.inv_no_optimize_pose = True
    return o


def _materialize_collection(collection, highres: bool) -> DatasetSplit:
    images, images_hr, poses, focals, bboxes, classes = [], [], [], [], [], []
    for sample in collection:
        img = sample["img"]
        if highres:
            images_hr.append(np.clip(img, -1, 1))
            images.append(np.clip(image_ops.avg_pool2(img), -1, 1))
        else:
            images.append(np.clip(img, -1, 1))
        poses.append(sample["pose"])
        focals.append(sample["focal"])
        bboxes.append(sample["normalized_bbox"])
        classes.append(sample["class"])
    classes = np.asarray(classes)
    return DatasetSplit(
        images=np.stack(images),
        images_highres=np.stack(images_hr) if highres else None,
        tform_cam2world=np.stack(poses),
        focal_length=np.concatenate(focals).reshape(-1),
        bbox=np.stack(bboxes),
        classes=classes,
        num_classes=int(classes.max()) + 1 if len(classes) else None,
    )


def load_dataset(
    dataset: str,
    data_path: str,
    resolution: int = 128,
    augment_p: Optional[float] = None,
    need_test: bool = False,
    use_class: bool = False,
    max_images: Optional[int] = None,
) -> Tuple[DatasetConfig, DatasetSplit, DatasetSplit, Optional[DatasetSplit]]:
    config = get_dataset_config(dataset)
    overrides = get_train_overrides(dataset)
    if augment_p is None:
        augment_p = overrides.augment_p
    highres = augment_p > 0 and config.is_highres

    if dataset.startswith("shapenet"):
        from nerf_from_image_tpu.data.srn import load_srn_split

        category = dataset.split("_")[1]
        path = os.path.join(data_path, "shapenet", category)
        train = load_srn_split(path, "train", resolution,
                               max_objects=max_images)
        train_eval = train
        test = (
            load_srn_split(path, "test", resolution, max_objects=max_images)
            if need_test
            else None
        )
        return config, train, train_eval, test

    if dataset == "carla":
        from nerf_from_image_tpu.data.carla import load_carla_split

        train = load_carla_split(
            os.path.join(data_path, "carla"), resolution, highres,
            max_images=max_images,
        )
        return config, train, train, None

    if dataset == "synthetic":
        from nerf_from_image_tpu.data.synthetic import make_synthetic_split

        train = make_synthetic_split(max_images or 64, resolution)
        return config, train, train, None

    # p3d / imagenet / cub collections.
    from nerf_from_image_tpu.data.custom import CUBCollection, CustomCollection

    if dataset == "cub":
        inst = lambda split, size, crop, mirrored: CUBCollection(
            split, size, data_path, crop=crop, add_mirrored=mirrored
        )
    else:
        inst = lambda split, size, crop, mirrored: CustomCollection(
            dataset, split, size, data_path, crop=crop, add_mirrored=mirrored
        )

    size_train = resolution * 2 if augment_p > 0 else resolution
    train = _materialize_collection(
        inst("train", size_train, False, True), highres=augment_p > 0
    )
    train_eval = _materialize_collection(
        inst("train", resolution, True, False), highres=False
    )
    test = None
    if need_test and config.views_per_object_test:
        test = _materialize_collection(
            inst("test", resolution, True, False), highres=False
        )
        test.bbox = test.bbox  # test keeps its crop bbox

    # Reference post-processing (data/loaders.py:377-399).
    if dataset == "cub":
        train.focal_length = None
        train.bbox = None
        train_eval.focal_length = None
        train_eval.bbox = None
        if test is not None:
            test.focal_length = None
            test.bbox = None
    else:
        train.bbox = None  # training images are always uncropped

    if not use_class or dataset != "cub":
        train.classes = None
        train.num_classes = None
        train_eval.classes = None
        train_eval.num_classes = None

    return config, train, train_eval, test


def autodetect_dataset(experiment_name: str) -> str:
    """Dataset from a checkpoint/experiment name (reference:
    data/loaders.py:197-210)."""
    choices = [
        "shapenet_cars", "shapenet_chairs", "p3d_car", "cub", "carla",
        "imagenet_car", "imagenet_airplane", "imagenet_motorcycle",
        "imagenet_zebra", "imagenet_elephant",
    ]
    found = None
    for choice in choices:
        if f"_{choice}_" in experiment_name:
            assert found is None
            found = choice
    if not found:
        raise RuntimeError("Unable to autodetect dataset")
    return found
