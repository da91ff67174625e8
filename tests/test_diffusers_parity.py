"""Parity anchors vs REAL diffusers — importorskip-guarded.

diffusers is not installed in this image (verified), so these tests skip
today; they activate automatically the day it lands (same policy as the
sklearn/skimage oracle tests). They anchor BOTH our flax models AND the
in-repo torch transcription (utils/torch_oracle.py) against the actual
implementation the reference uses (reference finetuning/cars.py:113-119):
the transcription's state_dict keys match diffusers naming, so one
load_state_dict drives all three implementations from the same weights.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
diffusers = pytest.importorskip("diffusers")

import jax
import jax.numpy as jnp

from diffmining_tpu.models.unet import UNet2DCondition, UNetConfig
from diffmining_tpu.models.vae import AutoencoderKL, VAEConfig
from diffmining_tpu.utils.torch_oracle import AutoencoderKLRef, UNet2DConditionRef
from diffmining_tpu.utils.weights import convert_unet, convert_vae


def test_unet_three_way_parity():
    torch.manual_seed(0)
    hf = diffusers.UNet2DConditionModel(
        sample_size=16,
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64, 64),
        layers_per_block=2,
        cross_attention_dim=32,
        attention_head_dim=8,  # per-head dim: 32/8=4 heads at width 32
        down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    heads = 32 // 8
    tref = UNet2DConditionRef(
        block_out_channels=(32, 64, 64), layers_per_block=2, cross_attention_dim=32,
        num_attention_heads=heads, down_block_has_attn=(True, True, False), norm_num_groups=8,
    ).eval()
    missing, unexpected = tref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not missing, missing[:5]

    cfg = UNetConfig(
        block_out_channels=(32, 64, 64), layers_per_block=2, cross_attention_dim=32,
        num_attention_heads=heads, down_block_has_attn=(True, True, False), norm_num_groups=8,
    )
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    params = {"params": convert_unet(sd)}

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ctx = rng.randn(1, 7, 32).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x), torch.tensor([261]), torch.from_numpy(ctx)).sample.numpy()
        oracle = tref(torch.from_numpy(x), torch.tensor([261]), torch.from_numpy(ctx)).numpy()
    got = np.asarray(
        unet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([261], jnp.int32), jnp.asarray(ctx))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(oracle, want, rtol=1e-4, atol=1e-5)  # transcription vs diffusers
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)  # flax vs diffusers


def test_vae_encoder_parity():
    torch.manual_seed(1)
    hf = diffusers.AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
    ).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    tref = AutoencoderKLRef(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4).eval()
    missing, _ = tref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not missing, missing[:5]

    vae = AutoencoderKL(VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4), dtype=jnp.float32)
    params = {"params": convert_vae(sd)}

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        posterior = hf.encode(torch.from_numpy(x)).latent_dist
        want_mean = posterior.mean.numpy()
        oracle_mean, _ = tref.encode_moments(torch.from_numpy(x))
    mean, _ = vae.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), method=AutoencoderKL.encode)
    np.testing.assert_allclose(oracle_mean.numpy(), want_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), want_mean, rtol=1e-3, atol=2e-4
    )
