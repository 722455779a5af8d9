"""LPIPS perceptual distance (VGG16 backbone) in pure JAX/flax.

JAX re-design of the reference's LPIPS wrapper (reference:
lib/metrics.py:106-146, which wraps the `lpips` pip package with feature
caching). The VGG16 feature trunk and the 5 linear heads are implemented
natively (NHWC); torch weights (torchvision VGG16 + lpips lin heads) load
through utils/torch_interop-style key mapping via `lpips_state_to_variables`.

Feature caching is preserved: `features()` returns the normalized per-layer
activations, and `distance()` accepts either images or cached features —
the inversion loop caches the target's features once and reuses them for all
optimization steps (reference: run.py:2202-2254 usage).

Without pretrained weights (zero-egress environments) the module still
defines a valid perceptual metric with deterministic He-style random
features — useful for smoke tests and benchmarks; metric-grade numbers
require loading the released weights.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# VGG16 conv plan: (out_channels, num_convs) per stage; LPIPS taps the relu
# output at the end of each stage.
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 trunk emitting the 5 LPIPS tap activations. Input NHWC in
    [-1, 1] (after the LPIPS scaling layer)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        taps = []
        conv_idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
            for _ in range(n_convs):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding=1,
                    name=f"conv{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
            if stage < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return tuple(taps)


def normalize_tensor(x, eps=1e-10):
    """Unit-normalizes along the channel axis (lpips.normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance: sum over layers of lin_l(|f0 - f1|^2) spatial
    means."""

    def setup(self):
        self.net = VGG16Features()
        chans = [c for c, _ in _VGG_STAGES]
        self.lins = [
            self.param(
                f"lin{i}", nn.initializers.uniform(scale=0.1), (chans[i],)
            )
            for i in range(len(chans))
        ]

    def __call__(self, in0, in1):
        f0 = self.features(in0)
        f1 = in1 if isinstance(in1, tuple) else self.features(in1)
        return self.distance_from_features(f0, f1)

    def features(self, im) -> Tuple[jnp.ndarray, ...]:
        """im: [B, H, W, 3] in [-1, 1] -> normalized tap activations."""
        shift = jnp.asarray(_SHIFT, im.dtype)
        scale = jnp.asarray(_SCALE, im.dtype)
        x = (im - shift) / scale
        taps = self.net(x)
        return tuple(normalize_tensor(t) for t in taps)

    def distance_from_features(self, f0, f1) -> jnp.ndarray:
        """[B, 1] perceptual distance from cached normalized features."""
        total = 0.0
        for i, (x, y) in enumerate(zip(f0, f1)):
            # 1x1 conv with non-negative weights (lpips clamps at eval).
            d = jnp.square(x - y) @ jnp.maximum(self.lins[i], 0.0)
            total = total + jnp.mean(d, axis=(1, 2))
        return total[:, None]


def lpips_state_to_variables(variables, torch_state):
    """Fills LPIPS variables from the `lpips` package's state dict
    (keys: net.slice*/features conv weights + lin{i}.model.1.weight)."""
    import numpy as np

    params = jax.tree.map(lambda x: x, variables["params"])  # copy
    # Torch lpips VGG16 conv indices within torchvision features:
    conv_positions = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, pos in enumerate(conv_positions):
        w = None
        b = None
        for k, v in torch_state.items():
            if k.endswith(f"features.{pos}.weight") or k.endswith(
                f"slice{_slice_of(pos)}.{pos}.weight"
            ):
                w = np.asarray(v)
            if k.endswith(f"features.{pos}.bias") or k.endswith(
                f"slice{_slice_of(pos)}.{pos}.bias"
            ):
                b = np.asarray(v)
        if w is None:
            raise KeyError(f"VGG conv {pos} not found in torch state")
        # OIHW -> HWIO
        params["net"][f"conv{i}"]["kernel"] = jnp.asarray(
            np.transpose(w, (2, 3, 1, 0))
        )
        params["net"][f"conv{i}"]["bias"] = jnp.asarray(b)
    for i in range(5):
        for k, v in torch_state.items():
            if k.endswith(f"lin{i}.model.1.weight") or k.endswith(
                f"lins.{i}.model.1.weight"
            ):
                params[f"lin{i}"] = jnp.asarray(np.asarray(v).reshape(-1))
    return {"params": params}


def _slice_of(pos):
    if pos <= 3:
        return 1
    if pos <= 8:
        return 2
    if pos <= 15:
        return 3
    if pos <= 22:
        return 4
    return 5


def init_lpips_variables(model, key, resolution, weights_path=None):
    """Initializes LPIPS variables, loading the pretrained torch weights
    when available — `weights_path` argument or the NFI_LPIPS_WEIGHTS env
    var pointing at an `lpips` package VGG16 state dict (reference:
    lib/metrics.py:106-146 constructs lpips.LPIPS(net='vgg'), which
    downloads those weights). Without weights the deterministic random
    features documented above are kept."""
    import os

    variables = model.init(
        key,
        jnp.zeros((1, resolution, resolution, 3)),
        jnp.zeros((1, resolution, resolution, 3)),
    )
    weights_path = weights_path or os.environ.get("NFI_LPIPS_WEIGHTS")
    if weights_path and os.path.exists(weights_path):
        from nerf_from_image_tpu.utils import torch_interop

        state = torch_interop.load_torch_checkpoint(weights_path)
        variables = jax.tree.map(
            jnp.asarray, lpips_state_to_variables(dict(variables), state)
        )
        print("Loaded LPIPS weights from", weights_path)
    else:
        print(
            "WARNING: LPIPS running on deterministic RANDOM VGG features "
            "— 'lpips' numbers are NOT metric grade (set NFI_LPIPS_WEIGHTS "
            "to an lpips-package VGG16 state dict for real values)."
        )
    return variables


def lpips_metric_grade(weights_path=None) -> bool:
    """True when pretrained LPIPS weights are available — i.e. reported
    'lpips' values are comparable to the reference's. Drivers stamp
    reports with a RANDOM-FEATURE note when this is False."""
    import os

    weights_path = weights_path or os.environ.get("NFI_LPIPS_WEIGHTS")
    return bool(weights_path and os.path.exists(weights_path))
