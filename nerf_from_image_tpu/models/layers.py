"""Equalized-learning-rate layers and StyleGAN2 modulated convolution.

JAX/flax re-design of the reference building blocks (reference:
models/stylegan.py:114-225 conv_modulated2d / EqualizedLinear /
EqualizedConv2d). TPU-first choices:

- NHWC activations everywhere: XLA's TPU conv emitter wants channels on the
  minor (lane) axis; weights are stored in the torch OIHW layout for
  mechanical checkpoint interop and transposed to HWIO at call time (XLA
  folds the transpose into the convolution).
- Modulation uses the input-scale / output-demodulate trick — one shared
  weight batched conv on the MXU instead of per-sample grouped convs; this is
  the same algebra as the reference, which exists precisely because it is the
  hardware-friendly formulation.
- No custom autograd: transposed convs ARE conv VJPs in XLA, so the
  reference's EfficientResample (models/stylegan.py:22-48) has no analog.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_from_image_tpu.ops import filters


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


class EqualizedLinear(nn.Module):
    """Linear layer with runtime weight scaling (equalized learning rate)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    activate: bool = False
    lr_multiplier: float = 1.0
    init_bias_one: bool = False
    # Compute dtype for the matmul/bias (params stay f32); None keeps
    # the input's promotion semantics. bf16 here halves the activation
    # bandwidth of the [N, hidden] decoder intermediates in
    # plane_dtype='bfloat16' production mode.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_multiplier,
            (self.out_features, self.in_features),
        )
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        scaled = weight * weight_gain
        if self.dtype is not None:
            x = x.astype(self.dtype)
            scaled = scaled.astype(self.dtype)
        y = x @ scaled.T
        if self.use_bias:
            init = nn.initializers.ones if self.init_bias_one else nn.initializers.zeros
            bias = self.param("bias", init, (self.out_features,))
            bias = bias * self.lr_multiplier
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        if self.activate:
            y = leaky_relu(y * math.sqrt(2.0))
        return y


def conv2d(x, weight_oihw, stride=1, padding=0):
    """Plain conv, NHWC activations, torch-layout OIHW weights."""
    kernel = jnp.transpose(weight_oihw, (2, 3, 1, 0))  # HWIO
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_transpose2d(x, weight_iohw, stride=2, padding=0):
    """Transposed conv matching torch semantics; weight layout (in, out, kh, kw)."""
    kh, kw = weight_iohw.shape[-2:]
    kernel = jnp.transpose(weight_iohw[:, :, ::-1, ::-1], (2, 3, 0, 1))  # HWIO
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=(
            (kh - 1 - padding, kh - 1 - padding),
            (kw - 1 - padding, kw - 1 - padding),
        ),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_resampled2d(x, weight_oihw, f=None, up=False, down=False, padding=0):
    """Conv fused with 2x up/down resampling (reference:
    models/stylegan.py:86-111)."""
    assert not (up and down)
    kw = weight_oihw.shape[-1]

    if kw == 1 and down:
        assert padding == 0
        x = filters.downsample2d(x, f)
        return conv2d(x, weight_oihw)
    if down:
        x = filters.filter2d(x, f, transpose=True)
        return conv2d(x, weight_oihw, stride=2)
    if up:
        assert padding == 1
        x = conv_transpose2d(x, jnp.swapaxes(weight_oihw, 0, 1), stride=2)
        return filters.filter2d(x, f, gain=4.0)
    return conv2d(x, weight_oihw, padding=padding)


def conv_modulated2d(
    x,
    weight_oihw,
    styles,
    noise=None,
    up=False,
    down=False,
    padding=0,
    resample_filter=None,
    demodulate=True,
):
    """StyleGAN2 modulated convolution (input-scale / output-demodulate form).

    Args:
      x: [B, H, W, Cin] activations.
      weight_oihw: [Cout, Cin, kh, kw] shared weight.
      styles: [B, Cin] per-sample modulation.
      noise: optional [B, H', W', 1-or-Cout] additive noise (already scaled).
    """
    bs = x.shape[0]
    if demodulate:
        w = weight_oihw[None] * styles.reshape(bs, 1, -1, 1, 1)
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)

    x = x * styles.reshape(bs, 1, 1, -1)
    x = conv_resampled2d(
        x, weight_oihw, f=resample_filter, up=up, down=down, padding=padding
    )
    if demodulate:
        x = x * dcoefs.reshape(bs, 1, 1, -1)
    if noise is not None:
        x = x + noise
    return x


class EqualizedConv2d(nn.Module):
    """Equalized-lr conv with optional fused 2x resampling and activation."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activate: bool = False
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, gain: float = 1.0):
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size**2)
        x = conv_resampled2d(
            x,
            weight * weight_gain,
            f=filters.bilinear_filter(x.dtype),
            up=self.up,
            down=self.down,
            padding=self.kernel_size // 2,
        )
        act_gain = (math.sqrt(2.0) if self.activate else 1.0) * gain
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            x = x + bias
        if act_gain != 1.0:
            x = x * act_gain
        if self.activate:
            x = leaky_relu(x)
        return x


def normalize_latent(x, axis=-1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class ConditionalLayerNorm(nn.Module):
    """LayerNorm modulated by a latent (reference: models/generator.py:42-60)."""

    ch: int
    emb_dim: int

    @nn.compact
    def __call__(self, x, z):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        beta = EqualizedLinear(self.emb_dim, self.ch, name="fc_beta")(z)
        gamma = EqualizedLinear(self.emb_dim, self.ch, name="fc_gamma")(z)
        while beta.ndim < x.ndim:
            beta = beta[..., None, :]
            gamma = gamma[..., None, :]
        return beta + (1.0 + gamma) * x


class LayerNormAffine(nn.Module):
    """Plain LayerNorm with learnable affine, torch naming (weight/bias)."""

    ch: int

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        weight = self.param("weight", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        return x * weight + bias
