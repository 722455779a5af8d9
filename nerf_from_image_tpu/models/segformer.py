"""SegFormer (MiT-B5) backbone + all-MLP decode head in pure JAX/flax.

JAX re-design of the reference's dependency-free SegFormer
(reference: models/segformer.py:24-310): 4-stage overlapping patch embedding
transformer (depths [3, 6, 40, 3], spatial-reduction attention ratios
[8, 4, 2, 1]) fused to a 512-channel feature map at 1/4 input resolution.

TPU-first notes: activations flow as [B, N, C] token tensors (lane-minor C),
attention is plain batched matmul (MXU), and the spatial-reduction conv
keeps K/V token counts small (the reference's trick — already the right
shape for TPU). Params are stored in torch layouts with reference state-dict
naming so the released mit_b5.pth / encoder checkpoints load mechanically.
Dropout/drop-path are identity at inference and enabled via the 'dropout'
rng collection during training.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchLinear(nn.Module):
    """Linear with torch-layout params (weight [out, in], bias [out])."""

    in_features: int
    out_features: int
    std: float = 0.02

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight",
            nn.initializers.truncated_normal(stddev=self.std),
            (self.out_features, self.in_features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return x @ weight.T + bias


class TorchConv(nn.Module):
    """Conv2d with torch-layout OIHW params, NHWC activations."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        fan_out = self.kernel_size * self.kernel_size * self.out_channels
        fan_out //= self.groups
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=math.sqrt(2.0 / fan_out)),
            (
                self.out_channels,
                self.in_channels // self.groups,
                self.kernel_size,
                self.kernel_size,
            ),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        kernel = jnp.transpose(weight, (2, 3, 1, 0))  # HWIO
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return y + bias


class TorchLayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return x * weight + bias


def drop_path(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(
        rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1)
    ).astype(x.dtype)
    return x * mask / keep


class SegAttention(nn.Module):
    """Efficient self-attention with spatial reduction of K/V."""

    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, height, width):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = 1.0 / math.sqrt(hd)

        q = TorchLinear(C, C, name="q")(x).reshape(B, N, nh, hd)
        q = jnp.transpose(q, (0, 2, 1, 3))  # [B, nh, N, hd]

        if self.sr_ratio > 1:
            x_ = x.reshape(B, height, width, C)
            x_ = TorchConv(
                C, C, self.sr_ratio, stride=self.sr_ratio, name="sr"
            )(x_)
            x_ = x_.reshape(B, -1, C)
            x_ = TorchLayerNorm(C, eps=1e-5, name="norm")(x_)
        else:
            x_ = x
        kv = TorchLinear(C, 2 * C, name="kv")(x_).reshape(B, -1, 2, nh, hd)
        k = jnp.transpose(kv[:, :, 0], (0, 2, 1, 3))
        v = jnp.transpose(kv[:, :, 1], (0, 2, 1, 3))

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
        )
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)
        return TorchLinear(C, C, name="proj")(out)


class SegMLP(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, height, width):
        B, N, _ = x.shape
        x = TorchLinear(self.dim, self.hidden, name="fc1")(x)
        h = x.reshape(B, height, width, self.hidden)
        h = TorchConv(
            self.hidden,
            self.hidden,
            3,
            padding=1,
            groups=self.hidden,
            name="dwconv_dwconv",
        )(h)
        x = h.reshape(B, N, self.hidden)
        x = jax.nn.gelu(x, approximate=False)
        return TorchLinear(self.hidden, self.dim, name="fc2")(x)


class SegBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, height, width, deterministic=True):
        rng1 = rng2 = None
        if not deterministic and self.drop_path_rate > 0:
            rng1 = self.make_rng("dropout")
            rng2 = self.make_rng("dropout")
        y = SegAttention(
            self.dim, self.num_heads, self.sr_ratio, name="attn"
        )(TorchLayerNorm(self.dim, name="norm1")(x), height, width)
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng1)
        y = SegMLP(self.dim, self.dim * self.mlp_ratio, name="mlp")(
            TorchLayerNorm(self.dim, name="norm2")(x), height, width
        )
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng2)
        return x


class SegOverlapPatchEmbed(nn.Module):
    patch_size: int
    stride: int
    in_channels: int
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        x = TorchConv(
            self.in_channels,
            self.embed_dim,
            self.patch_size,
            stride=self.stride,
            padding=self.patch_size // 2,
            name="proj",
        )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = TorchLayerNorm(C, eps=1e-5, name="norm")(x)
        return x, H, W


def _resize_bilinear(x, size):
    """NHWC bilinear resize, align_corners=False (half-pixel centers)."""
    B, _, _, C = x.shape
    return jax.image.resize(
        x, (B, size[0], size[1], C), method="bilinear"
    )


class Segformer(nn.Module):
    """MiT-B5 + all-MLP head -> [B, H/4, W/4, out_features]."""

    out_features: int = 512
    in_channels: int = 3
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    drop_path_rate: float = 0.1
    depths: Sequence[int] = (3, 6, 40, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    decoder_dim: int = 768

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        total = sum(self.depths)
        dpr = [
            self.drop_path_rate * i / max(total - 1, 1) for i in range(total)
        ]
        features = []
        cur = 0
        for i in range(4):
            x, H, W = SegOverlapPatchEmbed(
                patch_size=7 if i == 0 else 3,
                stride=4 if i == 0 else 2,
                in_channels=self.in_channels if i == 0 else self.embed_dims[i - 1],
                embed_dim=self.embed_dims[i],
                name=f"patch_embed{i+1}",
            )(x)
            for j in range(self.depths[i]):
                x = SegBlock(
                    self.embed_dims[i],
                    self.num_heads[i],
                    self.mlp_ratios[i],
                    dpr[cur + j],
                    self.sr_ratios[i],
                    name=f"block{i+1}_{j}",
                )(x, H, W, deterministic)
            cur += self.depths[i]
            x = TorchLayerNorm(self.embed_dims[i], name=f"norm{i+1}")(x)
            x = x.reshape(B, H, W, self.embed_dims[i])
            features.append(x)
            # Next stage consumes the NHWC map directly.

        target_hw = features[0].shape[1:3]
        all_c = []
        for i in reversed(range(4)):
            c = TorchLinear(
                self.embed_dims[i], self.decoder_dim, name=f"linear_c{i+1}_proj"
            )(features[i].reshape(B, -1, self.embed_dims[i]))
            c = c.reshape(
                B, features[i].shape[1], features[i].shape[2], self.decoder_dim
            )
            if i > 0:
                c = _resize_bilinear(c, target_hw)
            all_c.append(c)

        x = TorchConv(
            4 * self.decoder_dim, self.decoder_dim, 1, name="linear_fuse"
        )(jnp.concatenate(all_c, axis=-1))
        x = TorchConv(
            self.decoder_dim, self.out_features, 1, name="linear_pred"
        )(x)
        return x


def segformer_rename(path: str) -> str:
    """flax param path -> reference state-dict key."""
    out = path
    out = out.replace("dwconv_dwconv", "dwconv.dwconv")
    out = out.replace("_proj.", ".proj.")  # linear_cN_proj -> linear_cN.proj
    # blockN_M -> blockN.M
    import re

    out = re.sub(r"block(\d+)_(\d+)\.", r"block\1.\2.", out)
    return out
