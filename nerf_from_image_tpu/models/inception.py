"""FID InceptionV3 (the "TensorFlow-weights" variant) in pure JAX/flax.

JAX re-design of the FID feature extractor used by the reference through
pytorch-fid (reference: lib/fid.py:22-44). Architecture matches pytorch-fid's
FID Inception exactly — the modified InceptionA/C blocks with
count_include_pad=False average pooling, and a MAX-pool branch in the final
InceptionE_2 block — so its released weight file loads via
`inception_state_to_variables`. Feature = 2048-dim pool3 activations;
inputs are [B, H, W, 3] in [0, 1], resized to 299x299 (bilinear,
half-pixel centers) and scaled to [-1, 1] like pytorch-fid does.

Unlike the reference (which pulls activations to the host per batch,
lib/fid.py:38), activations stay on device and feed metrics/fid.py directly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _avg_pool(x, window=3, stride=1, padding=1, count_include_pad=True):
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    if count_include_pad:
        return s / (window * window)
    ones = jnp.ones_like(x[..., :1])
    cnt = jax.lax.reduce_window(
        ones,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return s / cnt


def _max_pool(x, window=3, stride=2, padding=0):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm(eps=1e-3, inference) + ReLU; torch-layout
    params + running stats in the 'buffers' collection."""

    in_channels: int
    out_channels: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        weight = self.param(
            "conv_weight",
            nn.initializers.normal(stddev=0.1),
            (self.out_channels, self.in_channels, kh, kw),
        )
        kernel = jnp.transpose(weight, (2, 3, 1, 0))
        x = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        gamma = self.param("bn_weight", nn.initializers.ones,
                           (self.out_channels,))
        beta = self.param("bn_bias", nn.initializers.zeros,
                          (self.out_channels,))
        mean = self.variable(
            "buffers", "bn_running_mean",
            lambda: jnp.zeros((self.out_channels,)),
        ).value
        var = self.variable(
            "buffers", "bn_running_var",
            lambda: jnp.ones((self.out_channels,)),
        ).value
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    in_ch: int
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(self.in_ch, 64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(self.in_ch, 48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(48, 64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(self.in_ch, 64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(64, 96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, 96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool(x, count_include_pad=False)  # FID variant
        bp = BasicConv2d(self.in_ch, self.pool_features, (1, 1),
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    in_ch: int

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(self.in_ch, 384, (3, 3), stride=2,
                         name="branch3x3")(x)
        bd = BasicConv2d(self.in_ch, 64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(64, 96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, 96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    in_ch: int
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(self.in_ch, 192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(self.in_ch, c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(c7, 192, (7, 1), padding=(3, 0),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(self.in_ch, c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, c7, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(c7, 192, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x, count_include_pad=False)  # FID variant
        bp = BasicConv2d(self.in_ch, 192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    in_ch: int

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(self.in_ch, 192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(192, 320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(self.in_ch, 192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, 192, (1, 7), padding=(0, 3),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, 192, (7, 1), padding=(3, 0),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, 192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    in_ch: int
    pool_mode: str = "avg"  # 'avg' (E_1, count_include_pad=False) | 'max' (E_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(self.in_ch, 320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(self.in_ch, 384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, 384, (1, 3), padding=(0, 1),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, 384, (3, 1), padding=(1, 0),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(self.in_ch, 448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(448, 384, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, 384, (1, 3), padding=(0, 1),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, 384, (3, 1), padding=(1, 0),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool(x, count_include_pad=False)
        else:
            bp = _max_pool(x, window=3, stride=1, padding=1)
        bp = BasicConv2d(self.in_ch, 192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """pool3 (2048-dim) activations for FID."""

    resize_input: bool = True
    normalize_input: bool = True  # [0,1] -> [-1,1]

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            B, _, _, C = x.shape
            x = jax.image.resize(x, (B, 299, 299, C), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(3, 32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, 32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(32, 64, (3, 3), padding=(1, 1),
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(64, 80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(80, 192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(192, 32, name="Mixed_5b")(x)
        x = InceptionA(256, 64, name="Mixed_5c")(x)
        x = InceptionA(288, 64, name="Mixed_5d")(x)
        x = InceptionB(288, name="Mixed_6a")(x)
        x = InceptionC(768, 128, name="Mixed_6b")(x)
        x = InceptionC(768, 160, name="Mixed_6c")(x)
        x = InceptionC(768, 160, name="Mixed_6d")(x)
        x = InceptionC(768, 192, name="Mixed_6e")(x)
        x = InceptionD(768, name="Mixed_7a")(x)
        x = InceptionE(1280, pool_mode="avg", name="Mixed_7b")(x)
        x = InceptionE(2048, pool_mode="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # [B, 2048]


def inception_rename(path: str) -> str:
    """flax path -> pytorch-fid state-dict key."""
    out = path
    out = out.replace("conv_weight", "conv.weight")
    out = out.replace("bn_weight", "bn.weight")
    out = out.replace("bn_bias", "bn.bias")
    out = out.replace("bn_running_mean", "bn.running_mean")
    out = out.replace("bn_running_var", "bn.running_var")
    return out


def inception_state_to_variables(variables, torch_state):
    """Loads pytorch-fid's pt_inception weights into the flax tree."""
    from nerf_from_image_tpu.utils.torch_interop import state_dict_to_variables

    clean = {
        k: v
        for k, v in torch_state.items()
        if "fc." not in k and "AuxLogits" not in k
        and not k.endswith("num_batches_tracked")
    }
    return state_dict_to_variables(variables, clean, rename=inception_rename)
