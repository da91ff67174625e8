"""Layout-primitive parity vs torch: every place the NCHW reference and our
NHWC stack could disagree (conv padding, strided downsample alignment, nearest
upsample, GroupNorm) is pinned here with transposed-weight equivalence —
the per-module harness SURVEY.md §7 hard-part 1 calls for, independent of
diffusers (absent in this image)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv_weights(torch_conv):
    """torch OIHW -> flax HWIO kernel + bias (the converter's transform)."""
    k = torch_conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = torch_conv.bias.detach().numpy() if torch_conv.bias is not None else None
    return k, b


def _run_flax_conv(x_nhwc, torch_conv, strides=1, padding=1):
    k, b = _conv_weights(torch_conv)
    conv = nn.Conv(torch_conv.out_channels, torch_conv.kernel_size, strides=strides,
                   padding=padding, use_bias=b is not None)
    params = {"params": {"kernel": jnp.asarray(k), **({"bias": jnp.asarray(b)} if b is not None else {})}}
    return np.asarray(conv.apply(params, jnp.asarray(x_nhwc)))


def test_conv3x3_pad1():
    torch.manual_seed(0)
    tc = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = torch.randn(2, 3, 10, 12)
    want = tc(x).detach().numpy().transpose(0, 2, 3, 1)
    got = _run_flax_conv(x.numpy().transpose(0, 2, 3, 1), tc, padding=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unet_downsample_stride2_pad1():
    """diffusers Downsample2D: Conv2d(k3, stride 2, padding 1)."""
    torch.manual_seed(1)
    tc = torch.nn.Conv2d(4, 4, 3, stride=2, padding=1)
    x = torch.randn(1, 4, 16, 16)
    want = tc(x).detach().numpy().transpose(0, 2, 3, 1)
    got = _run_flax_conv(x.numpy().transpose(0, 2, 3, 1), tc, strides=2, padding=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vae_downsample_asymmetric_pad():
    """diffusers VAE Downsample2D pads (0,1,0,1) then convs VALID at stride 2
    — the exact asymmetric alignment our Encoder reproduces (models/vae.py)."""
    torch.manual_seed(2)
    tc = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = torch.randn(1, 4, 17, 15)  # odd sizes stress the alignment
    xp = torch.nn.functional.pad(x, (0, 1, 0, 1))
    want = tc(xp).detach().numpy().transpose(0, 2, 3, 1)

    x_nhwc = np.pad(x.numpy().transpose(0, 2, 3, 1), ((0, 0), (0, 1), (0, 1), (0, 0)))
    got = _run_flax_conv(x_nhwc, tc, strides=2, padding="VALID")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nearest_upsample_2x():
    x = torch.randn(1, 3, 5, 7)
    want = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest").numpy().transpose(0, 2, 3, 1)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = np.asarray(jax.image.resize(x_nhwc, (1, 10, 14, 3), method="nearest"))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_groupnorm32():
    torch.manual_seed(3)
    tn = torch.nn.GroupNorm(4, 8, eps=1e-5)
    with torch.no_grad():
        tn.weight.normal_()
        tn.bias.normal_()
    x = torch.randn(2, 8, 6, 6)
    want = tn(x).detach().numpy().transpose(0, 2, 3, 1)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(tn.weight.detach().numpy()),
                         "bias": jnp.asarray(tn.bias.detach().numpy())}}
    got = np.asarray(gn.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    """Independent transcription of diffusers' get_timestep_embedding
    (flip_sin_to_cos=True, downscale_freq_shift=0)."""
    from diffmining_tpu.models.unet import timestep_embedding

    t = np.array([0, 1, 500, 999], dtype=np.float32)
    dim, max_period = 320, 10000
    half = dim // 2
    exponent = -np.log(max_period) * np.arange(half, dtype=np.float64) / half
    emb = t[:, None].astype(np.float64) * np.exp(exponent)[None]
    want = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    # fp32 sin/cos at phase ~1e3 carries ~1e-4 absolute error vs the f64 oracle
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
