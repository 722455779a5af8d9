"""Separable resampling filters (StyleGAN2-style) and progressive blur.

TPU-native equivalents of the reference's resampling ops (reference:
models/stylegan.py:22-111 EfficientResample/filter2d/upsample2d/downsample2d,
lib/ops.py:29-55 filt2d/blur). Everything is expressed as depthwise
`lax.conv_general_dilated` in NHWC layout: XLA maps these onto the MXU/VPU
directly and fuses the surrounding elementwise math, so no custom autograd
is needed (the reference's EfficientResample exists only because torch's
double-backward of conv was slow — in JAX transposed convs ARE the VJP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_filter(dtype=jnp.float32) -> jnp.ndarray:
    """The normalized separable [1, 3, 3, 1] resampling filter."""
    h = np.array([1.0, 3.0, 3.0, 1.0])
    h = h[:, None] * h[None, :]
    h /= h.sum()
    return jnp.asarray(h, dtype)


def depthwise_conv2d(
    x: jnp.ndarray,
    kernel2d: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    transpose: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Applies the same 2D kernel to every channel of an NHWC tensor.

    `transpose=True` gives torch's conv_transpose2d semantics (stride becomes
    input dilation, padding is subtracted from the implicit full padding, and
    the kernel is spatially flipped).

    `precision=None` is the backend default — bf16-truncated multiplies on
    TPU (and on this CPU backend), fine for the resampling filters whose
    golden tolerances absorb it. Pass Precision.HIGHEST where the
    reference's strict-f32 contract matters (warmup blur: the reference
    explicitly disables TF32, run.py:59-60).
    """
    C = x.shape[-1]
    kh, kw = kernel2d.shape
    if transpose:
        kernel2d = kernel2d[::-1, ::-1]
    # HWIO with feature_group_count=C: one input channel per group.
    kernel = jnp.broadcast_to(
        kernel2d.astype(x.dtype)[:, :, None, None], (kh, kw, 1, C)
    )
    if transpose:
        pad_h = (kh - 1 - padding, kh - 1 - padding)
        pad_w = (kw - 1 - padding, kw - 1 - padding)
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=(pad_h, pad_w),
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=precision,
        )
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        precision=precision,
    )


def filter2d(
    x: jnp.ndarray, kernel2d: jnp.ndarray, gain: float = 1.0, transpose: bool = False
) -> jnp.ndarray:
    """4-tap low-pass filtering with padding 1 (shrinks/grows H, W by 1)."""
    if gain != 1.0:
        kernel2d = kernel2d * gain
    return depthwise_conv2d(x, kernel2d, stride=1, padding=1, transpose=transpose)


def upsample2d(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """2x upsampling: strided transposed depthwise conv with 4x gain."""
    return depthwise_conv2d(x, kernel2d * 4.0, stride=2, padding=1, transpose=True)


def downsample2d(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """2x downsampling: strided depthwise conv."""
    return depthwise_conv2d(x, kernel2d, stride=2, padding=1, transpose=False)


def filt2d_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Same-size depthwise filtering with a 1D (separable) or 2D kernel."""
    if kernel.ndim == 1:
        kernel = kernel[None, :] * kernel[:, None]
    pad = kernel.shape[-1] // 2
    return depthwise_conv2d(
        x, kernel, stride=1, padding=pad,
        precision=jax.lax.Precision.HIGHEST,
    )


def blur_dynamic(
    x: jnp.ndarray,
    sigma: jnp.ndarray,
    white_background: bool,
    max_blur_size: int = 30,
) -> jnp.ndarray:
    """Warmup blur with a TRACED sigma — one compiled program for the whole
    blur schedule.

    Matches the reference blur (lib/ops.py:42-55) which rebuilds a
    floor(3*sigma)-tap kernel every iteration (a dynamic shape). Here the
    kernel has a fixed 2*max_blur_size+1 support and taps beyond the
    dynamic extent are masked to zero in-graph, so the masked kernel equals
    the dynamic-support kernel while keeping shapes static under jit.
    sigma == 0 reduces exactly to identity; the conv runs at
    Precision.HIGHEST (the reference's strict-f32 contract, run.py:59-60).

    Boundary caveat (golden-tested): at iterations where the reference's
    f64 schedule lands within one ulp of an integer kernel-size boundary
    (e.g. i=900 of warmup 1000: f64 gives floor(2.9999999999999996)=2
    while the traced f32 sigma gives exactly 3.0), the discrete support
    differs by one tap for that single iteration. Away from exact
    boundaries (everywhere else: the schedule points are >= 1/warmup away
    from a boundary, f32 noise is ~1e-6) the supports are identical. The
    static `blur` below takes a host-side f64 sigma and reproduces the
    reference discretization bit-exactly at every iteration.
    """
    taps = jnp.arange(-max_blur_size, max_blur_size + 1, dtype=x.dtype)
    blur_size = jnp.floor(sigma * 3.0)
    safe_sigma = jnp.maximum(sigma, 1e-8)
    f = jnp.exp2(-jnp.square(taps / safe_sigma))
    f = jnp.where(jnp.abs(taps) <= blur_size, f, 0.0)
    f = jnp.where(blur_size > 0, f, (taps == 0).astype(x.dtype))
    f = f / jnp.sum(f)
    kernel = f[None, :] * f[:, None]
    if white_background:
        x = x - 1.0
    x = depthwise_conv2d(
        x, kernel, stride=1, padding=max_blur_size,
        precision=jax.lax.Precision.HIGHEST,
    )
    if white_background:
        x = x + 1.0
    return x


def blur_schedule_sigma(iteration, blur_warmup_iters: int):
    """Progressive blur sigma: 10 -> 0 linearly over the warmup."""
    return jnp.maximum(1.0 - iteration / blur_warmup_iters, 0.0) * 10.0


def blur(
    x: jnp.ndarray,
    sigma: float,
    white_background: bool,
) -> jnp.ndarray:
    """Discriminator-input blur used during GAN warmup.

    Static-kernel variant: `sigma` must be a Python float (the blur size
    determines the kernel shape, so under jit callers pass it as a static
    argument, re-jitting only when floor(3*sigma) changes — a handful of
    distinct programs over the whole warmup).
    """
    blur_size = int(np.floor(sigma * 3))
    if blur_size <= 0:
        return x
    f = np.arange(-blur_size, blur_size + 1, dtype=np.float64)
    f = np.exp2(-((f / sigma) ** 2))
    f = jnp.asarray(f / f.sum(), x.dtype)
    if white_background:
        x = x - 1.0
    x = filt2d_same(x, f)
    if white_background:
        x = x + 1.0
    return x
