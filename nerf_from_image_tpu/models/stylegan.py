"""StyleGAN2 backbone: mapping network, synthesis network, discriminator.

JAX/flax re-design of the reference backbone (reference:
models/stylegan.py:228-676). Module attribute names mirror the reference
state-dict structure (fc0..fcN, b4..b256, conv0/conv1/torgb, affine, ...)
so released PyTorch checkpoints load by mechanical key mapping.

Activations are NHWC (TPU lane-minor); noise is injected through explicit
PRNG keys; `noise_mode='none'|'const'|'random'` is a static argument so each
variant compiles once. The synthesis trunk is a fixed unrolled pyramid
(4^2 -> img_resolution^2) — static control flow, every conv lands on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_from_image_tpu.models.layers import (
    EqualizedConv2d,
    EqualizedLinear,
    conv_modulated2d,
    leaky_relu,
    normalize_latent,
)
from nerf_from_image_tpu.ops import filters


class MappingNetwork(nn.Module):
    """z (+ optional conditioning) -> w, broadcast to num_ws."""

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    lr_multiplier: float = 0.01
    normalize_c: bool = True
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None

    @nn.compact
    def __call__(self, z, c=None):
        embed_features = self.embed_features
        if embed_features is None:
            embed_features = self.w_dim if self.normalize_c else self.c_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features or self.w_dim
        features_list = (
            [self.z_dim + embed_features]
            + [layer_features] * (self.num_layers - 1)
            + [self.w_dim]
        )

        x = None
        if self.z_dim > 0:
            x = normalize_latent(z)
        if self.c_dim > 0:
            if self.normalize_c:
                y = normalize_latent(
                    EqualizedLinear(self.c_dim, embed_features, name="embed")(c)
                )
            else:
                y = c
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y

        for idx in range(self.num_layers):
            x = EqualizedLinear(
                features_list[idx],
                features_list[idx + 1],
                activate=True,
                lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}",
            )(x)

        if self.num_ws is not None and x.ndim == 2:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
        return x


class SynthesisLayer(nn.Module):
    """Modulated 3x3 conv (+ optional 2x upsample) with noise and lrelu."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: bool = False
    use_noise: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x, w, noise_mode: str = "none", noise_key=None, gain=1.0):
        styles = EqualizedLinear(
            self.w_dim, self.in_channels, init_bias_one=True, name="affine"
        )(w)
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
        )

        noise = None
        if self.use_noise:
            noise_strength = self.param(
                "noise_strength", nn.initializers.zeros, ()
            )
            noise_const = self.variable(
                "buffers",
                "noise_const",
                lambda: jax.random.normal(
                    self.make_rng("buffers")
                    if self.has_rng("buffers")
                    else jax.random.key(0),
                    (self.resolution, self.resolution),
                ),
            ).value
            if noise_mode == "random":
                assert noise_key is not None
                noise = (
                    jax.random.normal(
                        noise_key,
                        (x.shape[0], self.resolution, self.resolution, 1),
                        dtype=x.dtype,
                    )
                    * noise_strength
                )
            elif noise_mode == "const":
                noise = (noise_const * noise_strength)[None, :, :, None]

        x = conv_modulated2d(
            x,
            weight,
            styles,
            noise=noise,
            up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=filters.bilinear_filter(x.dtype),
        )

        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        act_gain = (math.sqrt(2.0) if self.activate else 1.0) * gain
        x = x + bias
        if act_gain != 1.0:
            x = x * act_gain
        if self.activate:
            x = leaky_relu(x)
        return x


class OutputLayer(nn.Module):
    """toRGB: modulated 1x1 conv without demodulation."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, w):
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size**2)
        styles = (
            EqualizedLinear(
                self.w_dim, self.in_channels, init_bias_one=True, name="affine"
            )(w)
            * weight_gain
        )
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
        )
        x = conv_modulated2d(x, weight, styles, demodulate=False)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return x + bias


class SynthesisBlock(nn.Module):
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    use_noise: bool = True

    @nn.compact
    def __call__(self, x, img, ws, noise_mode="none", noise_key=None):
        w_idx = 0
        keys = (
            jax.random.split(noise_key, 2)
            if noise_key is not None
            else (None, None)
        )

        if self.in_channels == 0:
            const = self.param(
                "const",
                nn.initializers.normal(stddev=1.0),
                (self.out_channels, self.resolution, self.resolution),
            )
            x = jnp.broadcast_to(
                jnp.transpose(const, (1, 2, 0))[None],
                (ws.shape[0], self.resolution, self.resolution, self.out_channels),
            )
        else:
            x = SynthesisLayer(
                self.in_channels,
                self.out_channels,
                w_dim=self.w_dim,
                resolution=self.resolution,
                up=True,
                use_noise=self.use_noise,
                name="conv0",
            )(x, ws[:, w_idx], noise_mode, keys[0])
            w_idx += 1
        x = SynthesisLayer(
            self.out_channels,
            self.out_channels,
            w_dim=self.w_dim,
            resolution=self.resolution,
            use_noise=self.use_noise,
            name="conv1",
        )(x, ws[:, w_idx], noise_mode, keys[1])
        w_idx += 1

        if img is not None:
            img = filters.upsample2d(img, filters.bilinear_filter(img.dtype))
        y = OutputLayer(
            self.out_channels, self.img_channels, w_dim=self.w_dim, name="torgb"
        )(x, ws[:, w_idx])
        img = img + y if img is not None else y
        return x, img


def synthesis_channel_dict(img_resolution, channel_base=32768, channel_max=512):
    resolutions = [2**i for i in range(2, int(math.log2(img_resolution)) + 1)]
    return resolutions, {
        res: min(channel_base // res, channel_max) for res in resolutions
    }


class SynthesisNetwork(nn.Module):
    """Progressive const-4x4 -> img_resolution synthesis pyramid."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    use_noise: bool = True

    @property
    def num_ws(self) -> int:
        resolutions, _ = synthesis_channel_dict(
            self.img_resolution, self.channel_base, self.channel_max
        )
        # 1 conv for the 4x4 block, 2 for the rest, +1 torgb on the last.
        return sum(1 if res == 4 else 2 for res in resolutions) + 1

    @nn.compact
    def __call__(self, ws, noise_mode: str = "none", noise_key=None):
        resolutions, channels = synthesis_channel_dict(
            self.img_resolution, self.channel_base, self.channel_max
        )
        keys = (
            jax.random.split(noise_key, len(resolutions))
            if noise_key is not None
            else [None] * len(resolutions)
        )
        x = img = None
        w_idx = 0
        for i, res in enumerate(resolutions):
            in_ch = channels[res // 2] if res > 4 else 0
            num_conv = 1 if res == 4 else 2
            block_ws = ws[:, w_idx : w_idx + num_conv + 1]
            w_idx += num_conv
            x, img = SynthesisBlock(
                in_ch,
                channels[res],
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                use_noise=self.use_noise,
                name=f"b{res}",
            )(x, img, block_ws, noise_mode, keys[i])
        return img


class DiscriminatorBlock(nn.Module):
    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int

    @nn.compact
    def __call__(self, x, img):
        if self.in_channels == 0:
            y = EqualizedConv2d(
                self.img_channels,
                self.tmp_channels,
                kernel_size=1,
                activate=True,
                name="fromrgb",
            )(img)
            x = x + y if x is not None else y
            img = None

        y = EqualizedConv2d(
            self.tmp_channels,
            self.out_channels,
            kernel_size=1,
            use_bias=False,
            down=True,
            name="skip",
        )(x, gain=math.sqrt(2.0) / 2.0)
        x = EqualizedConv2d(
            self.tmp_channels, self.tmp_channels, kernel_size=3, activate=True,
            name="conv0",
        )(x)
        x = EqualizedConv2d(
            self.tmp_channels,
            self.out_channels,
            kernel_size=3,
            activate=True,
            down=True,
            name="conv1",
        )(x, gain=math.sqrt(2.0) / 2.0)
        return y + x, img


def minibatch_std(x, group_size: int, num_channels: int = 1):
    """Appends per-group feature std channels (reference:
    models/stylegan.py:542-567). x: [B, H, W, C]."""
    bs, h, w, c = x.shape
    ng = min(group_size, bs)
    f = num_channels
    nc = c // f
    y = x.reshape(ng, bs // ng, h, w, f, nc)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))  # [bs//ng, f]
    y = jnp.tile(y[None, :, None, None, :], (ng, 1, h, w, 1)).reshape(bs, h, w, f)
    return jnp.concatenate([x, y], axis=-1)


class DiscriminatorOutput(nn.Module):
    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1

    @nn.compact
    def __call__(self, x, cmap=None):
        if self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = EqualizedConv2d(
            self.in_channels + self.mbstd_num_channels,
            self.in_channels,
            kernel_size=3,
            activate=True,
            name="conv",
        )(x)
        # Flatten in torch NCHW order for checkpoint-compatible fc weights.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = EqualizedLinear(
            self.in_channels * self.resolution**2,
            self.in_channels,
            activate=True,
            name="fc",
        )(x)
        x = EqualizedLinear(
            self.in_channels,
            1 if self.cmap_dim == 0 else self.cmap_dim,
            name="out",
        )(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(self.cmap_dim)
        return x


class DiscriminatorBackbone(nn.Module):
    """StyleGAN2 discriminator with optional projection conditioning."""

    c_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    cmap_dim: Optional[int] = None
    mapping_lr_multiplier: float = 0.01
    mapping_num_layers: int = 2

    @nn.compact
    def __call__(self, img, c=None):
        resolutions = [
            2**i for i in range(int(math.log2(self.img_resolution)), 2, -1)
        ]
        channels = {
            res: min(self.channel_base // res, self.channel_max)
            for res in resolutions + [4]
        }
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else channels[4]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        for res in resolutions:
            x, img = DiscriminatorBlock(
                channels[res] if res < self.img_resolution else 0,
                channels[res],
                channels[res // 2],
                resolution=res,
                img_channels=self.img_channels,
                name=f"b{res}",
            )(x, img)

        cmap = None
        if self.c_dim == -1:
            cmap = c
        elif self.c_dim > 0:
            cmap = MappingNetwork(
                z_dim=0,
                c_dim=self.c_dim,
                w_dim=cmap_dim,
                num_ws=None,
                num_layers=self.mapping_num_layers,
                lr_multiplier=self.mapping_lr_multiplier,
                normalize_c=False,
                name="mapping",
            )(None, c)
        return DiscriminatorOutput(
            channels[4],
            cmap_dim=cmap_dim,
            resolution=4,
            img_channels=self.img_channels,
            name="b4",
        )(x, cmap)
