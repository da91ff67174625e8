"""UNet/VAE WIRING parity vs a hand-transcribed torch oracle.

Round-1 pinned only layout primitives (test_torch_block_parity.py); nothing
tested the UNet's wiring — skip-connection ordering, GEGLU, time-embedding
plumbing, per-block head dims, upsample-size forwarding — against the torch
semantics the reference relies on (reference dift.py:23-169 spells out that
forward). These tests drive tests/torch_sd_transcription.py (state-dict keys
in diffusers naming) through the REAL weight converter
(utils/weights.py convert_unet/convert_vae) into our flax modules and assert
fp32 activation parity, so a wiring swap anywhere in models/unet.py,
models/vae.py, or the converter's rename/transpose rules fails here.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffmining_tpu.models.unet import UNet2DCondition, UNetConfig
from diffmining_tpu.models.vae import AutoencoderKL, VAEConfig
from diffmining_tpu.utils.weights import convert_unet, convert_vae

from torch_sd_transcription import AutoencoderKLRef, UNet2DConditionRef

# Exercises every structural feature of SD-v1.5 at tiny width: 3 blocks
# (mixed-attn down stack with a no-attn final block), layers_per_block=2
# (so up blocks have 3 resnets and the skip-channel pattern out/out/in),
# multi-head attention with per-block head dims (32/4=8, 64/4=16).
CFG = dict(
    block_out_channels=(32, 64, 64),
    layers_per_block=2,
    cross_attention_dim=32,
    num_attention_heads=4,
    down_block_has_attn=(True, True, False),
    norm_num_groups=8,
)


def _state_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


@pytest.fixture(scope="module")
def unet_pair():
    torch.manual_seed(0)
    tref = UNet2DConditionRef(**CFG).eval()
    cfg = UNetConfig(
        block_out_channels=CFG["block_out_channels"],
        layers_per_block=CFG["layers_per_block"],
        cross_attention_dim=CFG["cross_attention_dim"],
        num_attention_heads=CFG["num_attention_heads"],
        down_block_has_attn=CFG["down_block_has_attn"],
        norm_num_groups=CFG["norm_num_groups"],
    )
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    params = {"params": convert_unet(_state_np(tref))}
    return tref, unet, params


@pytest.fixture(scope="module")
def vae_pair():
    torch.manual_seed(1)
    tref = AutoencoderKLRef(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4).eval()
    vae = AutoencoderKL(VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4), dtype=jnp.float32)
    params = {"params": convert_vae(_state_np(tref))}
    return tref, vae, params


def test_unet_converted_tree_is_exhaustive(unet_pair):
    """Every torch tensor lands on exactly the flax param it belongs to: the
    converted tree and a fresh init agree on paths AND shapes. Catches rename
    drift in _unet_rename before it can silently mis-wire real checkpoints."""
    tref, unet, params = unet_pair
    x = jnp.zeros((1, 8, 8, 4))
    init = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 32)))
    assert _tree_paths(params) == _tree_paths(init)


def test_vae_converted_tree_is_exhaustive(vae_pair):
    tref, vae, params = vae_pair
    init = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), method=AutoencoderKL.encode_decode)
    assert _tree_paths(params) == _tree_paths(init)


def test_unet_forward_parity(unet_pair):
    """Full eps-prediction forward, fp32, at a NON-multiple-of-4 spatial size
    (14x10 -> 7x5 -> 4x3) so the upsample-size forwarding path
    (reference dift.py:44-56,146-147) is exercised too."""
    tref, unet, params = unet_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 14, 10).astype(np.float32)
    ctx = rng.randn(2, 7, 32).astype(np.float32)
    t = 261

    with torch.no_grad():
        want = tref(torch.from_numpy(x), torch.tensor([t]), torch.from_numpy(ctx)).numpy()

    got = unet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([t, t], jnp.int32), jnp.asarray(ctx))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_unet_up_ft_tap_parity(unet_pair):
    """DIFT taps = the FULL up-block output, i.e. after that block's
    upsampler (reference dift.py:134-165). Pinned per-index vs the oracle."""
    tref, unet, params = unet_pair
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ctx = rng.randn(1, 7, 32).astype(np.float32)

    with torch.no_grad():
        _, want_ft = tref(torch.from_numpy(x), torch.tensor([161]), torch.from_numpy(ctx), up_ft_indices=(0, 1, 2))

    out = unet.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([161], jnp.int32), jnp.asarray(ctx),
        up_ft_indices=(0, 1, 2),
    )
    for i in (0, 1, 2):
        want = want_ft[i].numpy()
        got = np.asarray(out["up_ft"][i]).transpose(0, 3, 1, 2)
        assert got.shape == want.shape, f"up_ft[{i}]: {got.shape} vs {want.shape}"
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_unet_parity_is_discriminative(unet_pair):
    """The tolerance above would catch a wiring bug: swapping one attention's
    q/k projections (a minimal plausible mis-wiring) moves the output by
    orders of magnitude more than the parity tolerance."""
    tref, unet, params = unet_pair
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    t = jnp.asarray([161], jnp.int32)
    ctx = jnp.asarray(rng.randn(1, 7, 32).astype(np.float32))

    base = np.asarray(unet.apply(params, x, t, ctx))
    import copy

    bad = copy.deepcopy(params)
    attn = bad["params"]["down_0_tf_0"]["transformer_blocks_0"]["attn1"]
    attn["to_q"]["kernel"], attn["to_k"]["kernel"] = attn["to_k"]["kernel"], attn["to_q"]["kernel"]
    swapped = np.asarray(unet.apply(bad, x, t, ctx))
    assert np.abs(swapped - base).max() > 1e-2


def test_vae_encode_parity(vae_pair):
    """Encoder + quant_conv moments at an ODD input size (asymmetric
    downsample alignment), split into (mean, clamped logvar)."""
    tref, vae, params = vae_pair
    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 17, 15).astype(np.float32)
    with torch.no_grad():
        want_mean, want_logvar = tref.encode_moments(torch.from_numpy(x))
    mean, logvar = vae.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2), want_mean.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar).transpose(0, 3, 1, 2), want_logvar.numpy(), rtol=1e-3, atol=2e-4)


def test_vae_decode_parity(vae_pair):
    tref, vae, params = vae_pair
    rng = np.random.RandomState(4)
    z = (rng.randn(1, 4, 6, 5) * 0.18215).astype(np.float32)
    with torch.no_grad():
        want = tref.decode(torch.from_numpy(z)).numpy()
    got = vae.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)), method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-3, atol=3e-4)


def test_unet_depth2_transformer_parity():
    """transformer_layers=2 (SDXL-style Transformer2DModel depth) through the
    converter + oracle: pins the depth plumbing added to the oracle (which
    SD-v1.5's depth-1 configs never exercise)."""
    torch.manual_seed(2)
    tref = UNet2DConditionRef(**CFG, transformer_layers=2).eval()
    cfg = UNetConfig(
        block_out_channels=CFG["block_out_channels"],
        layers_per_block=CFG["layers_per_block"],
        cross_attention_dim=CFG["cross_attention_dim"],
        num_attention_heads=CFG["num_attention_heads"],
        down_block_has_attn=CFG["down_block_has_attn"],
        norm_num_groups=CFG["norm_num_groups"],
        transformer_layers=2,
    )
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    params = {"params": convert_unet(_state_np(tref))}
    rng = np.random.RandomState(7)
    x = rng.randn(1, cfg.in_channels, 16, 16).astype(np.float32)
    ctx = rng.randn(1, 77, cfg.cross_attention_dim).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.from_numpy(x), torch.tensor([261]), torch.from_numpy(ctx)).numpy()
    got = np.asarray(
        unet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([261], jnp.int32), jnp.asarray(ctx))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
