"""Torch-oracle parity at the PRODUCTION SD-v1.5 configuration.

Round-2's transcription-parity tests pinned the wiring only at shrunken
configs (test_torch_transcription_parity.py uses 3 blocks / 32-64 channels) —
a config-scale-dependent bug (group counts at 320/640/1280 channels, tap
indices at 4-level depth, head-dim handling at 8 heads, the 4th no-attn down
block) would pass every tiny test. This file runs ONE fp32 forward through
the hand-written torch oracle (tests/torch_sd_transcription.py) and the REAL
weight converter at the exact SD-v1.5 architecture the reference loads
(reference diffmining/finetuning/cars.py:113-119, typicality/dift.py:23-169):
4 levels, (320, 640, 1280, 1280) channels, 8 heads, cross-dim 768, plus the
full VAE at (128, 256, 512, 512).

Runs on CPU in minutes (marked `slow`); skippable with -m "not slow".
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffmining_tpu.models.unet import SD15_UNET, UNet2DCondition
from diffmining_tpu.models.vae import SD15_VAE, AutoencoderKL
from diffmining_tpu.utils.weights import convert_unet, convert_vae

from torch_sd_transcription import AutoencoderKLRef, UNet2DConditionRef

pytestmark = pytest.mark.slow


def _state_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.slow
def test_sd15_unet_full_config_forward_and_tap_parity():
    """One 64x64-latent (512px-image) eps forward + the DIFT up_ft[1] tap at
    the real SD-v1.5 config, oracle vs converted flax."""
    torch.manual_seed(0)
    tref = UNet2DConditionRef(
        block_out_channels=SD15_UNET.block_out_channels,
        layers_per_block=SD15_UNET.layers_per_block,
        cross_attention_dim=SD15_UNET.cross_attention_dim,
        num_attention_heads=SD15_UNET.num_attention_heads,
        down_block_has_attn=SD15_UNET.down_block_has_attn,
        norm_num_groups=SD15_UNET.norm_num_groups,
    ).eval()
    unet = UNet2DCondition(SD15_UNET, dtype=jnp.float32)
    params = {"params": convert_unet(_state_np(tref))}

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 64, 64).astype(np.float32)
    ctx = rng.randn(1, 77, 768).astype(np.float32)
    t = 261

    with torch.no_grad():
        want, want_ft = tref(
            torch.from_numpy(x), torch.tensor([t]), torch.from_numpy(ctx), up_ft_indices=(1,)
        )
    out = unet.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([t], jnp.int32),
        jnp.asarray(ctx), up_ft_indices=(1,),
    )
    got = np.asarray(out["sample"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=5e-4)
    got_ft = np.asarray(out["up_ft"][1]).transpose(0, 3, 1, 2)
    assert got_ft.shape == tuple(want_ft[1].shape)  # [1, 1280, 16, 16]
    np.testing.assert_allclose(got_ft, want_ft[1].numpy(), rtol=1e-3, atol=5e-4)

    # the sweep's ctx_tile dedup must hold at production scale too
    ctx2 = np.concatenate([ctx, rng.randn(1, 77, 768).astype(np.float32)])
    ded = unet.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([t], jnp.int32),
        jnp.asarray(ctx2), ctx_tile=2,
    )
    plain = unet.apply(
        params, jnp.asarray(np.repeat(x.transpose(0, 2, 3, 1), 2, 0)),
        jnp.asarray([t, t], jnp.int32), jnp.asarray(ctx2),
    )
    np.testing.assert_allclose(np.asarray(ded), np.asarray(plain), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sd15_vae_full_config_encode_parity():
    """VAE encoder moments at the real config on a 128px crop (the conv/norm
    channel widths are what's at stake; spatial extent only scales runtime)."""
    torch.manual_seed(1)
    tref = AutoencoderKLRef(
        block_out_channels=SD15_VAE.block_out_channels,
        layers_per_block=SD15_VAE.layers_per_block,
        norm_num_groups=SD15_VAE.norm_num_groups,
    ).eval()
    vae = AutoencoderKL(SD15_VAE, dtype=jnp.float32)
    params = {"params": convert_vae(_state_np(tref))}

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        want_mean, want_logvar = tref.encode_moments(torch.from_numpy(x))
    mean, logvar = vae.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), method=AutoencoderKL.encode
    )
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), want_mean.numpy(), rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(logvar).transpose(0, 3, 1, 2), want_logvar.numpy(), rtol=1e-3, atol=5e-4
    )
