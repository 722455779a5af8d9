"""nerf_from_image_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of yuliangguo/nerf-from-image (CVPR 2023 "Bootstrapped Radiance
Field Inversion" + driving-dataset evaluation pipelines).

Package layout:
  ops/       pure-JAX + Pallas compute primitives (rays, sampling, compositing,
             grid sampling, resampling filters, fused ray-march kernels)
  models/    neural networks (StyleGAN2 backbone, triplane generator,
             discriminator, SegFormer encoder, LPIPS, InceptionV3)
  pose/      differentiable pose parameterization + on-device PnP
  engine/    rendering orchestration, GAN/encoder training, hybrid inversion
  metrics/   PSNR/SSIM/IoU/LPIPS/FID — all on-device
  parallel/  jax.sharding Mesh construction + sharding rules
  data/      dataset configs and loaders
  utils/     checkpointing, reports, misc
"""

__version__ = "0.1.0"
