"""Triplane SDF radiance-field generator with a StyleGAN2 backbone.

JAX/flax re-design of the reference generator (reference:
models/generator.py:24-686). The architectural contract is preserved but
expressed functionally for XLA:

- The reference returns a Python `sampler` closure capturing synthesized
  triplanes (models/generator.py:587-684) so the expensive backbone runs once
  per render while the field is queried twice (coarse + fine). Here the same
  contract is explicit data-flow: `synthesize()` produces planes once, and
  the pure method `sample_field(planes, ...)` is called per sampling pass —
  trivially jit/shard-able, no hidden state.
- Field queries are [B, N, C] channel-minor; the triplane gather + tiny MLP
  is the hot op and has a fused Pallas implementation
  (ops/pallas/raymarch.py); this module is the XLA-autodiff reference path
  (needed for double-backward regularizers like eikonal).
- SDF->density via Laplace CDF (VolSDF), learnable (beta, alpha) scalars.

Attribute names mirror the reference state-dict for checkpoint interop.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_from_image_tpu.models.layers import (
    ConditionalLayerNorm,
    EqualizedConv2d,
    EqualizedLinear,
    LayerNormAffine,
    leaky_relu,
)
from nerf_from_image_tpu.models.stylegan import MappingNetwork, SynthesisNetwork
from nerf_from_image_tpu.ops.grid_sample import grid_sample_2d
from nerf_from_image_tpu.ops.triplane import (
    pack_corners,
    plane_coords,
    sample_packed,
)

_INV_SQRT2 = math.sqrt(2.0) / 2.0


def laplace_pdf(x, beta):
    return 0.5 * jnp.exp(-jnp.abs(x) / beta) / beta


def laplace_cdf(x, beta):
    return 0.5 + 0.5 * jnp.sign(x) * (1.0 - jnp.exp(-jnp.abs(x) / beta))


def wide_sigmoid_rescaled(x):
    """MipNeRF wide sigmoid rescaled to [-1.002, 1.002]."""
    return jax.nn.sigmoid(x) * 2.004 - 1.002


class ResidualEncoder(nn.Module):
    """Image -> feature-vector conv encoder (conditional-GAN / D embedding).

    Reference: models/generator.py:63-129. NHWC; instance norm optional.
    """

    nc: int
    nd: int
    use_instance_norm: bool = False

    @nn.compact
    def __call__(self, x):
        def norm(h, name):
            if not self.use_instance_norm:
                return h
            mean = jnp.mean(h, axis=(1, 2), keepdims=True)
            var = jnp.var(h, axis=(1, 2), keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            w = self.param(f"{name}_weight", nn.initializers.ones, (h.shape[-1],))
            b = self.param(f"{name}_bias", nn.initializers.zeros, (h.shape[-1],))
            return h * w + b

        bias_mid = not self.use_instance_norm

        def conv(cin, cout, name, use_bias=True, ks=3):
            return EqualizedConv2d(cin, cout, kernel_size=ks, use_bias=use_bias,
                                   name=name)

        def avgpool(h):
            return jax.lax.reduce_window(
                h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0

        x = leaky_relu(conv(self.nc, 64, "conv1")(x))
        x = leaky_relu(conv(64, 128, "conv2")(x))
        x = avgpool(x)

        s = x
        x = leaky_relu(norm(conv(128, 128, "conv3", bias_mid)(x), "norm3"))
        x = leaky_relu(norm(conv(128, 128, "conv4", bias_mid)(x), "norm4"))
        x = avgpool(x + s) * _INV_SQRT2

        s = conv(128, 256, "shortcut", False, ks=1)(x)
        x = leaky_relu(norm(conv(128, 256, "conv5", bias_mid)(x), "norm5"))
        x = leaky_relu(norm(conv(256, 256, "conv6", bias_mid)(x), "norm6"))
        x = avgpool(x + s) * _INV_SQRT2

        s = x
        x = leaky_relu(norm(conv(256, 256, "conv7", bias_mid)(x), "norm7"))
        x = leaky_relu(norm(conv(256, 256, "conv8", bias_mid)(x), "norm8"))
        x = avgpool(x + s) * _INV_SQRT2

        x = leaky_relu(conv(256, 512, "conv9")(x))
        x = leaky_relu(conv(512, 512, "conv10")(x))
        return jnp.mean(x, axis=(1, 2))


class AttentionMapper(nn.Module):
    """Latent -> RGB palette of `num_values` colors (texture attention).

    Reference: models/generator.py:132-186.
    """

    latent_dim: int
    num_values: int
    hidden_size: int = 512

    @nn.compact
    def __call__(self, c):
        const = self.param(
            "const", nn.initializers.normal(stddev=1.0), (1, self.hidden_size)
        )
        x = jnp.broadcast_to(const, (c.shape[0], self.hidden_size))

        def fc(name, bias=False):
            return EqualizedLinear(
                self.hidden_size, self.hidden_size, use_bias=bias, name=name
            )

        def cln(name):
            return ConditionalLayerNorm(self.hidden_size, self.latent_dim, name=name)

        shortcut = x
        x = leaky_relu(cln("norm1")(fc("fc1")(x), c))
        x = leaky_relu(cln("norm2")(fc("fc2")(x), c))
        x = (x + shortcut) * _INV_SQRT2

        shortcut = x
        x = leaky_relu(cln("norm3")(fc("fc3")(x), c))
        x = leaky_relu(cln("norm4")(fc("fc4")(x), c))
        x = (x + shortcut) * _INV_SQRT2

        x = leaky_relu(fc("fc5", bias=True)(x))
        values = EqualizedLinear(
            self.hidden_size, self.num_values * 3, name="fc_values"
        )(x)
        return wide_sigmoid_rescaled(values.reshape(-1, self.num_values, 3))


class ViewDirectionMapper(nn.Module):
    """View direction -> feature-space residual (CARLA view-dependence).

    Reference: models/generator.py:189-253. Returns the per-ray direction
    embedding; `apply_viewdir` combines it with sampled features.
    """

    num_features: int = 32
    hidden_size: int = 64

    @nn.compact
    def __call__(self, viewdir):
        def fc(cin, cout, name, bias=True):
            return EqualizedLinear(cin, cout, use_bias=bias, name=name)

        x = leaky_relu(fc(3, self.hidden_size, "fc0")(viewdir))

        shortcut = x
        x = leaky_relu(LayerNormAffine(self.hidden_size, name="norm1")(
            fc(self.hidden_size, self.hidden_size, "fc1", False)(x)))
        x = leaky_relu(LayerNormAffine(self.hidden_size, name="norm2")(
            fc(self.hidden_size, self.hidden_size, "fc2", False)(x)))
        x = (x + shortcut) * _INV_SQRT2

        shortcut = x
        x = leaky_relu(LayerNormAffine(self.hidden_size, name="norm3")(
            fc(self.hidden_size, self.hidden_size, "fc3", False)(x)))
        x = leaky_relu(LayerNormAffine(self.hidden_size, name="norm4")(
            fc(self.hidden_size, self.hidden_size, "fc4", False)(x)))
        x = (x + shortcut) * _INV_SQRT2

        x = leaky_relu(fc(self.hidden_size, self.hidden_size, "fc5")(x))
        x = fc(self.hidden_size, self.num_features, "fc6")(x)
        return x  # [B, ..., 1, num_features] per-ray embedding


class ViewDirOutput(nn.Module):
    """The zero-init output projection of the viewdir mapper."""

    num_features: int
    output_size: int

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight", nn.initializers.zeros, (self.output_size, self.num_features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.output_size,))
        weight_gain = 1.0 / math.sqrt(self.num_features)
        return x @ (weight * weight_gain).T + bias


class TriplanarDecoder(nn.Module):
    """Bilinear triplane sampling + 2-layer softplus MLP.

    Reference: models/generator.py:288-331. Planes are [B, 3, H, W, C]
    (channel-minor); returns (density_or_distance [B, N, 1],
    features [B, N, num_output_features]).
    """

    num_input_features: int
    num_output_features: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, planes, coords, splat_spec=None):
        # coords: [B, N, 3] normalized to [-1, 1]. planes either raw
        # [B, 3, H, W, C] or corner-packed [B, 3, H, W, 4C]
        # (ops/triplane.pack_corners — one gather per plane per point).
        splat_dtype = None
        if (
            splat_spec is not None
            and planes.shape[-1] == self.num_input_features
        ):
            # Fused-splat path: packed-gather forward + Pallas windowed
            # splat backward (ops/pallas/splat.triplane_sample_mean).
            # First-order only — regularizer (double-backward) queries go
            # through the grid_sample branch below.
            from nerf_from_image_tpu.ops.pallas.splat import (
                triplane_sample_mean,
            )

            img_shape, table_dtype, block_shape, WY, WX, save_rows = (
                splat_spec
            )
            x = triplane_sample_mean(
                planes, coords, img_shape, table_dtype, block_shape, WY,
                WX, save_rows,
            )
            splat_dtype = (
                jnp.bfloat16 if table_dtype == "bfloat16" else None
            )
        else:
            c_xy, c_xz, c_yz = plane_coords(coords)
            if planes.shape[-1] == 4 * self.num_input_features:
                e1 = sample_packed(planes[:, 0], c_xy)
                e2 = sample_packed(planes[:, 1], c_xz)
                e3 = sample_packed(planes[:, 2], c_yz)
            else:
                e1 = grid_sample_2d(planes[:, 0], c_xy)
                e2 = grid_sample_2d(planes[:, 1], c_xz)
                e3 = grid_sample_2d(planes[:, 2], c_yz)
            x = (e1 + e2 + e3) / 3.0
        in_dtype = coords.dtype
        # bf16 production mode: keep the [N, hidden] MLP intermediates in
        # bf16 too (params stay f32); only the [N, 1+F] head output is
        # cast back. f32 tables keep the exact-f32 decode.
        mlp_dtype = (
            jnp.bfloat16 if planes.dtype == jnp.bfloat16 else splat_dtype
        )
        x = EqualizedLinear(
            self.num_input_features, self.hidden_dim, name="net_0",
            dtype=mlp_dtype,
        )(x)
        x = jax.nn.softplus(x)
        x = EqualizedLinear(
            self.hidden_dim, 1 + self.num_output_features, name="net_2",
            dtype=mlp_dtype,
        )(x)
        x = x.astype(in_dtype)
        return x[..., :1], x[..., 1:]


class Generator(nn.Module):
    """Top-level generator. Compose via the granular methods:

      mapping(z, c) -> ws                        [B, num_ws, 512]
      synthesize(ws) -> planes                   [B, 3, R, R, 32]
      texture(w_tex) -> attention palette        [B, K, 3]
      sample_field(planes, attn, points, ...)    field queries
      + regularizer helpers (engine-level; see engine/regularizers.py)
    """

    latent_dim: int
    scene_range: float
    attention_values: int = 0
    use_viewdir: bool = False
    use_encoder: bool = False
    use_sdf: bool = True
    num_classes: Optional[int] = None
    w_dim: int = 512
    plane_channels: int = 32
    synthesis_resolution: int = 256
    channel_base: int = 32768
    channel_max: int = 512

    @property
    def num_synthesis_ws(self) -> int:
        import math as _math

        n_levels = int(_math.log2(self.synthesis_resolution)) - 1
        return 2 * n_levels - 1 + 1  # 1 conv at 4x4, 2 per level after, +torgb

    @property
    def num_ws(self) -> int:
        return self.num_synthesis_ws + (1 if self.attention_values > 0 else 0)

    def setup(self):
        c_dim = 512 if self.num_classes else 0
        if self.use_encoder:
            self.emb = ResidualEncoder(3, self.w_dim, use_instance_norm=True)
            c_dim = 512  # ResidualEncoder's pooled feature width is fixed.

        self.mapping_network = MappingNetwork(
            z_dim=self.latent_dim,
            c_dim=c_dim,
            w_dim=self.w_dim,
            num_ws=self.num_ws,
            num_layers=2,
            lr_multiplier=0.01,
            normalize_c=False,
        )
        self.synthesis_network = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.synthesis_resolution,
            img_channels=3 * self.plane_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            use_noise=True,  # params exist; noise_mode controls usage
        )
        if self.use_viewdir:
            decoder_output_dim = 32
        elif self.attention_values > 0:
            decoder_output_dim = self.attention_values
        else:
            decoder_output_dim = 3
        self.decoder = TriplanarDecoder(self.plane_channels, decoder_output_dim)

        if self.use_viewdir:
            self.viewdir_mapper = ViewDirectionMapper(num_features=32)
            # The output width (attention palette size, or 3 for raw RGB)
            # lives on the zero-init projection alone.
            self.viewdir_output = ViewDirOutput(
                32, self.attention_values if self.attention_values > 0 else 3
            )
        if self.use_sdf:
            self.beta = self.param("beta", lambda k, s: jnp.full(s, 0.1), (1,))
            self.alpha = self.param("alpha", lambda k, s: jnp.full(s, 1.0), (1,))
        if self.attention_values > 0:
            self.texture_mapper = AttentionMapper(self.w_dim, self.attention_values)
        if self.num_classes:
            self.class_embedding = nn.Embed(self.num_classes, 512)

    # ---- latent pipeline -------------------------------------------------

    def mapping(self, z, label=None, image=None):
        """z [B, latent] (+ class label / conditioning image) -> ws."""
        c = None
        if self.use_encoder:
            assert image is not None
            c = self.emb(image)
        elif self.num_classes:
            assert label is not None
            c = self.class_embedding(label)
        return self.mapping_network(z, c)

    def average_w(self, key, n_samples: int = 10000, label=None):
        """Mean w over latent samples (inversion init; reference
        models/generator.py:263-282).

        Unconditional: 10k samples -> [1, num_ws, w_dim]. Class-conditional:
        pass `label` [B] int labels; 256 samples per label (reference's
        conditional branch) -> [B, num_ws, w_dim]."""
        if label is None:
            z = jax.random.normal(key, (n_samples, self.latent_dim))
            w = self.mapping_network(z, None)
            return jnp.mean(w, axis=0, keepdims=True)
        assert self.num_classes, "label given but model is unconditional"
        n = min(n_samples, 256)
        B = label.shape[0]
        z = jax.random.normal(key, (B * n, self.latent_dim))
        c = self.class_embedding(jnp.repeat(label, n))
        w = self.mapping_network(z, c)
        return jnp.mean(w.reshape((B, n) + w.shape[1:]), axis=1)

    # ---- synthesis -------------------------------------------------------

    def synthesize(self, ws, noise_mode: str = "none", noise_key=None):
        """ws [B, num_ws, 512] -> triplanes [B, 3, R, R, C]."""
        w_synthesis = (
            ws[:, : self.num_synthesis_ws] if self.attention_values > 0 else ws
        )
        img = self.synthesis_network(w_synthesis, noise_mode, noise_key)
        B, H, W, _ = img.shape
        planes = img.reshape(B, H, W, 3, self.plane_channels)
        return jnp.transpose(planes, (0, 3, 1, 2, 4))

    def texture(self, ws):
        """Last (texture) w -> attention palette (attention_values > 0)."""
        assert self.attention_values > 0
        return self.texture_mapper(ws[:, self.num_synthesis_ws])

    def viewdir_embedding(self, viewdirs):
        """Per-ray view-direction embedding (CARLA only)."""
        assert self.use_viewdir
        return self.viewdir_mapper(viewdirs)

    # ---- field queries ---------------------------------------------------

    def decode(self, planes, coords, splat_spec=None):
        """Raw triplane decode at normalized coords [B, N, 3]."""
        return self.decoder(planes, coords, splat_spec)

    def density_from_distance(self, density_or_distance, out_of_box_mask):
        """SDF (or raw) decoder output -> volume density sigma [B, N]."""
        if self.use_sdf:
            beta = self.beta[0]
            alpha = 1.0 / self.alpha[0]
            neg_distance = -density_or_distance[..., -1]
            density_prealpha = laplace_cdf(neg_distance, beta) * (
                1.0 - out_of_box_mask
            )
            return alpha * density_prealpha
        density_pre = density_or_distance[..., -1] - 1.0
        return jax.nn.softplus(density_pre) * (1.0 - out_of_box_mask)

    def color_from_features(self, features, attention_values=None,
                            viewdir_embedding=None, want_semantics=False):
        """Decoder features -> rgb (and optional semantics probs).

        features: [B, N, F]; viewdir_embedding: per-point [B, N, F']
        (chunk-safe layout) or per-ray [B, R, 1, F'] broadcast over
        samples-per-ray (N = R * S).
        """
        if self.use_viewdir and viewdir_embedding is not None:
            if viewdir_embedding.ndim == 3:
                f = leaky_relu(viewdir_embedding + features)
                features = self.viewdir_output(f)
            else:
                B, N, F = features.shape
                R = viewdir_embedding.shape[1]
                f = features.reshape(B, R, N // R, F)
                f = leaky_relu(viewdir_embedding + f)
                features = self.viewdir_output(f).reshape(B, N, -1)

        semantics = None
        if self.attention_values == 0:
            rgb = wide_sigmoid_rescaled(features)
        else:
            probs = jax.nn.softmax(features, axis=-1)
            if want_semantics:
                semantics = probs
            rgb = jnp.matmul(probs, attention_values)
        return rgb, semantics

    def sample_field(
        self,
        planes,
        points,
        attention_values=None,
        viewdir_embedding=None,
        outputs: Sequence[str] = ("sigma", "rgb"),
        bbox_overlay: bool = False,
        splat_spec=None,
    ) -> Dict[str, jnp.ndarray]:
        """Queries the radiance field at world-space points.

        Args:
          planes: [B, 3, R, R, C] synthesized triplanes.
          points: [B, N, 3] world-space query points.
          outputs: subset of {'sigma','rgb','normals','semantics','coords',
            'sdf_distance'}.

        Reference semantics (models/generator.py:587-684): out-of-box points
        get zero density; normals are the normalized SDF gradient w.r.t. the
        input points (non-differentiable outputs; evaluation only).
        """
        for o in outputs:
            assert o in (
                "sigma", "rgb", "normals", "semantics", "coords", "sdf_distance"
            )
        res: Dict[str, jnp.ndarray] = {}

        coords = points / self.scene_range
        out_of_box = jax.lax.stop_gradient(
            jnp.any(jnp.abs(coords) > 1.0, axis=-1).astype(coords.dtype)
        )

        if "normals" in outputs:
            assert self.use_sdf

            # One linearized decode serves both the primal field values
            # and the SDF gradient (normals = normalized d distance/d
            # points) — running the decoder again would double the hot
            # triplane-gather cost of every normals render.
            def decode(pts):
                return self.decoder(
                    planes, pts / self.scene_range, splat_spec
                )

            (density_or_distance, features), vjp_fn = jax.vjp(decode, points)
            d_cot = jnp.zeros_like(density_or_distance)
            d_cot = d_cot.at[..., -1].set(1.0)
            (grad,) = vjp_fn((d_cot, jnp.zeros_like(features)))
            norm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
            res["normals"] = grad / jnp.maximum(norm, 1e-12)
        else:
            density_or_distance, features = self.decoder(
                planes, coords, splat_spec
            )

        if "sdf_distance" in outputs:
            res["sdf_distance"] = density_or_distance

        if "sigma" in outputs:
            sigma = self.density_from_distance(density_or_distance, out_of_box)
            if bbox_overlay:
                sigma = sigma + 100.0 * self._bbox_mask(points, out_of_box)
            res["sigma"] = sigma

        if "coords" in outputs:
            res["coords"] = points

        if "rgb" in outputs or "semantics" in outputs:
            rgb, semantics = self.color_from_features(
                features,
                attention_values,
                viewdir_embedding,
                want_semantics="semantics" in outputs,
            )
            if "rgb" in outputs:
                res["rgb"] = rgb
            if "semantics" in outputs:
                assert self.attention_values > 0
                res["semantics"] = semantics
        return res

    def init_all(self):
        """Touches every submodule once so `init(method='init_all')` builds
        the complete variable tree (flax initializes lazily per method)."""
        B = 1
        z = jnp.zeros((B, self.latent_dim))
        label = jnp.zeros((B,), jnp.int32) if self.num_classes else None
        image = (
            jnp.zeros((B, 128, 128, 3)) if self.use_encoder else None
        )
        ws = self.mapping(z, label, image)
        planes = self.synthesize(ws)
        attn = self.texture(ws) if self.attention_values > 0 else None
        vde = (
            self.viewdir_embedding(jnp.zeros((B, 4, 1, 3)))
            if self.use_viewdir
            else None
        )
        pts = jnp.zeros((B, 8, 3))
        return self.sample_field(
            planes, pts, attention_values=attn, viewdir_embedding=vde
        )

    def _bbox_mask(self, points, out_of_box):
        """Wireframe bounding-box overlay density (visualization;
        reference models/generator.py:645-659)."""
        eps = 5e-2
        a = jnp.abs(points)
        lim = self.scene_range - eps
        m = jnp.ones_like(out_of_box)
        m = m * (1.0 - jnp.all(a[..., jnp.array([0, 1])] < lim, axis=-1))
        m = m * (1.0 - jnp.all(a[..., jnp.array([0, 2])] < lim, axis=-1))
        m = m * (1.0 - jnp.all(a[..., jnp.array([1, 2])] < lim, axis=-1))
        return m * (1.0 - out_of_box)
