"""Golden test: SegFormer bootstrap encoder vs the PyTorch reference with
transferred weights (tiny depths; same architecture family)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import import_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")


def test_segformer_matches_reference():
    ref_segformer = import_reference_module("models.segformer")
    from nerf_from_image_tpu.models.segformer import Segformer, segformer_rename
    from nerf_from_image_tpu.utils import torch_interop

    torch.manual_seed(0)
    depths = [1, 1, 2, 1]
    tseg = ref_segformer.Segformer(
        img_size=64,
        out_features=32,
        embed_dims=[8, 16, 24, 32],
        num_heads=[1, 2, 3, 4],
        depths=depths,
        drop_path_rate=0.1,
        decoder_dim=48,
    )
    tseg.eval()

    jseg = Segformer(
        out_features=32,
        embed_dims=(8, 16, 24, 32),
        num_heads=(1, 2, 3, 4),
        depths=tuple(depths),
        drop_path_rate=0.1,
        decoder_dim=48,
    )
    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    variables = jseg.init(jax.random.key(0), jnp.asarray(x))
    sd = torch_interop.torch_module_state_to_numpy(tseg)
    variables = torch_interop.state_dict_to_variables(
        dict(variables), sd, rename=segformer_rename
    )
    variables = jax.tree.map(jnp.asarray, variables)

    with torch.no_grad():
        ref = tseg(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = jseg.apply(variables, jnp.asarray(x))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, ref, rtol=5e-3, atol=1e-4)


def test_bootstrap_encoder_matches_reference():
    ref_encoder = import_reference_module("models.encoder")
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder, encoder_rename
    from nerf_from_image_tpu.utils import torch_interop

    torch.manual_seed(1)
    # Build the reference with a tiny backbone by monkeypatching its
    # init_segformer to skip pretrained weights and shrink depths.
    import models.segformer as ref_seg_mod

    def tiny_init(out_features, in_channels=3, pretrained=True,
                  pretrained_model_path=None):
        return ref_seg_mod.Segformer(
            out_features=out_features,
            in_channels=in_channels,
            embed_dims=[8, 16, 24, 32],
            num_heads=[1, 2, 3, 4],
            depths=[1, 1, 1, 1],
            decoder_dim=48,
            init_weights=True,
        )

    orig = ref_seg_mod.init_segformer
    ref_seg_mod.init_segformer = tiny_init
    ref_encoder_mod = ref_encoder
    try:
        tenc = ref_encoder_mod.BootstrapEncoder(
            latent_dim=64, pretrained=False
        )
    finally:
        ref_seg_mod.init_segformer = orig
    tenc.eval()

    # Mirror the tiny backbone on our side by patching the Segformer
    # constructor used inside BootstrapEncoder.
    import nerf_from_image_tpu.models.encoder as jenc_mod

    orig_seg = jenc_mod.Segformer

    def tiny_seg(out_features, name, **kw):
        return orig_seg(
            out_features=out_features,
            embed_dims=(8, 16, 24, 32),
            num_heads=(1, 2, 3, 4),
            depths=(1, 1, 1, 1),
            decoder_dim=48,
            name=name,
        )

    jenc_mod.Segformer = tiny_seg
    try:
        jenc = jenc_mod.BootstrapEncoder(latent_dim=64)
        x = np.random.default_rng(1).random((1, 64, 64, 3)).astype(
            np.float32
        ) * 2 - 1
        variables = jenc.init(jax.random.key(0), jnp.asarray(x))
    finally:
        jenc_mod.Segformer = orig_seg

    sd = torch_interop.torch_module_state_to_numpy(tenc)
    variables = torch_interop.state_dict_to_variables(
        dict(variables), sd, rename=encoder_rename
    )
    variables = jax.tree.map(jnp.asarray, variables)

    with torch.no_grad():
        ref_coords, ref_mask, ref_w = tenc(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        )
    jenc_mod.Segformer = tiny_seg
    try:
        coords, mask, w = jenc.apply(variables, jnp.asarray(x))
    finally:
        jenc_mod.Segformer = orig_seg

    np.testing.assert_allclose(
        np.asarray(coords), ref_coords.numpy(), rtol=5e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mask), ref_mask.numpy(), rtol=5e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(w)[:, 0], ref_w.numpy()[:, 0], rtol=5e-3, atol=1e-4
    )
