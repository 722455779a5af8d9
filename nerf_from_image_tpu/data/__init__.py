from nerf_from_image_tpu.data.configs import (  # noqa: F401
    DatasetConfig,
    get_dataset_config,
    DATASET_CONFIGS,
)
