"""Shape/semantics tests of the SD model stack on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmining_tpu.models.clip import CLIPTextModel, TINY_CLIP_TEXT
from diffmining_tpu.models.unet import TINY_UNET, UNet2DCondition
from diffmining_tpu.models.vae import TINY_VAE, AutoencoderKL, sample_latent


@pytest.fixture(scope="module")
def unet_setup():
    unet = UNet2DCondition(TINY_UNET)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([10, 20])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 32))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    return unet, params, x, t, ctx


def test_unet_eps_shape(unet_setup):
    unet, params, x, t, ctx = unet_setup
    eps = unet.apply(params, x, t, ctx)
    assert eps.shape == x.shape


def test_unet_feature_taps(unet_setup):
    """Feature taps replace the reference's forked DIFT forward
    (diffmining/typicality/dift.py:23-169): up_ft[i] is up-block i's FULL
    output, i.e. after that block's upsampler (dift.py:134-165 runs
    `sample = upsample_block(...)` — upsamplers included — then taps).
    Pinned against the torch oracle in test_torch_transcription_parity.py."""
    unet, params, x, t, ctx = unet_setup
    out = unet.apply(params, x, t, ctx, up_ft_indices=(0, 1))
    ft = out["up_ft"]
    # tiny config: 2 blocks; block 0 taps post-upsample (16), block 1 at full res
    assert ft[0].shape == (2, 16, 16, 64)
    assert ft[1].shape == (2, 16, 16, 32)


def test_unet_odd_sizes(unet_setup):
    """Non-divisible spatial sizes must upsample back to the skip's size
    (reference handles this via forward_upsample_size, dift.py:48-56)."""
    unet, params, *_ = unet_setup
    x = jnp.zeros((1, 15, 9, 4))
    ctx = jnp.zeros((1, 77, 32))
    eps = unet.apply(params, x, jnp.array([3]), ctx)
    assert eps.shape == x.shape


def test_unet_collect_then_inject(unet_setup):
    """PnP contract: collecting taps from a source pass and injecting them into
    another pass forces the injected activations (replaces pnp.py's
    monkey-patching, pnp.py:275-476)."""
    unet, params, x, t, ctx = unet_setup
    src = unet.apply(params, x[:1], t[:1], ctx[:1], collect_injection=True)
    taps = src["taps"]
    assert any(k.endswith(".attn1.q") for k in taps)
    assert any(k.startswith("up.") and ".res." in k for k in taps)
    res_keys = [k for k in taps if k.startswith("up.") and ".res." in k]
    inj = {res_keys[0]: taps[res_keys[0]]}
    out = unet.apply(params, x, t, ctx, injection=inj, collect_injection=True)
    np.testing.assert_allclose(
        np.asarray(out["taps"][res_keys[0]][0], dtype=np.float32),
        np.asarray(taps[res_keys[0]][0], dtype=np.float32),
        rtol=1e-5,
    )


def test_unet_ctx_tile_matches_upfront_tiling(unet_setup):
    """ctx_tile=n (sweep prefix dedup) must equal running the UNet on the
    up-front-tiled batch: everything before the first cross-attention is
    condition-independent, so deduplicating it is pure CSE, not new math."""
    unet, params, x, t, ctx = unet_setup
    n_cond = 2
    # per-image condition pairs, conditions adjacent (the engine's layout)
    ctx_b = jax.random.normal(jax.random.PRNGKey(3), (2 * n_cond, 77, 32))
    out_dedup = unet.apply(params, x, t, ctx_b, ctx_tile=n_cond)
    out_plain = unet.apply(
        params, jnp.repeat(x, n_cond, axis=0), jnp.repeat(t, n_cond), ctx_b
    )
    assert out_dedup.shape == out_plain.shape == (2 * n_cond, 16, 16, 4)
    np.testing.assert_allclose(
        np.asarray(out_dedup), np.asarray(out_plain), rtol=1e-5, atol=1e-5
    )


def test_unet_ctx_tile_no_down_attention():
    """A config whose down blocks carry no transformers tiles at the mid
    block instead — the fallback path."""
    import dataclasses

    cfg = dataclasses.replace(TINY_UNET, down_block_has_attn=(False, False))
    unet = UNet2DCondition(cfg)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.array([5, 7])
    ctx_b = jax.random.normal(jax.random.PRNGKey(4), (4, 77, 32))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx_b[:2])
    out_dedup = unet.apply(params, x, t, ctx_b, ctx_tile=2)
    out_plain = unet.apply(params, jnp.repeat(x, 2, axis=0), jnp.repeat(t, 2), ctx_b)
    np.testing.assert_allclose(
        np.asarray(out_dedup), np.asarray(out_plain), rtol=1e-5, atol=1e-5
    )


def test_unet_timestep_dependence(unet_setup):
    unet, params, x, t, ctx = unet_setup
    e1 = unet.apply(params, x, jnp.array([5, 5]), ctx)
    e2 = unet.apply(params, x, jnp.array([900, 900]), ctx)
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 1e-6


def test_unet_bf16(unet_setup):
    _, params, x, t, ctx = unet_setup
    unet_bf16 = UNet2DCondition(TINY_UNET, dtype=jnp.bfloat16)
    eps = unet_bf16.apply(params, x.astype(jnp.bfloat16), t, ctx.astype(jnp.bfloat16))
    assert eps.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(eps, dtype=np.float32)).all()


def test_fused_norm_matches_module_path(unet_setup):
    """UNetConfig.fused_norm=True (the TPU inference fusion of GN→proj_in,
    ops/fused_norm.py) must share the module path's param tree and
    reproduce its outputs."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from diffmining_tpu.models.unet import TINY_UNET, UNet2DCondition

    unet, params, x, t, ctx = unet_setup
    fused = UNet2DCondition(dataclasses.replace(TINY_UNET, fused_norm=True))
    base = np.asarray(unet.apply(params, x, t, ctx))
    with pltpu.force_tpu_interpret_mode():
        init_fused = jax.eval_shape(fused.init, jax.random.PRNGKey(0), x, t, ctx)
        got = np.asarray(fused.apply(params, x, t, ctx))
    assert jax.tree_util.tree_structure(init_fused) == jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(got, base, rtol=2e-4, atol=2e-5)


def test_cmajor_world_matches_normal(unet_setup, monkeypatch):
    """DIFFMINING_TF_CMAJOR=1 (channel-major transformer blocks — the
    round-4 copy-elimination layout) is a layout change, not a numerics
    change: same param tree, same eps up to dot-order rounding."""
    unet, params, x, t, ctx = unet_setup
    ref = np.asarray(unet.apply(params, x, t, ctx))
    monkeypatch.setenv("DIFFMINING_TF_CMAJOR", "1")
    out = np.asarray(unet.apply(params, x, t, ctx))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    init_cm = jax.eval_shape(unet.init, jax.random.PRNGKey(0), x, t, ctx)
    assert jax.tree_util.tree_structure(init_cm) == jax.tree_util.tree_structure(params)


def test_cmajor_ctx_tile_matches_upfront_tiling(unet_setup, monkeypatch):
    """The sweep prefix dedup (ctx_tile) keeps its conditions-adjacent batch
    contract in the channel-major world (batch axis moves to 1 there)."""
    unet, params, x, t, ctx = unet_setup
    n_cond = 2
    ctx_b = jax.random.normal(jax.random.PRNGKey(3), (2 * n_cond, 77, 32))
    monkeypatch.setenv("DIFFMINING_TF_CMAJOR", "1")
    out_dedup = unet.apply(params, x, t, ctx_b, ctx_tile=n_cond)
    out_plain = unet.apply(
        params, jnp.repeat(x, n_cond, axis=0), jnp.repeat(t, n_cond), ctx_b
    )
    np.testing.assert_allclose(
        np.asarray(out_dedup), np.asarray(out_plain), rtol=1e-5, atol=1e-5
    )


def test_cmajor_collect_inject_cross_world(unet_setup, monkeypatch):
    """PnP taps are collected in CANONICAL [B,H,L,D] layout regardless of
    world, so taps recorded in one world inject into the other: collect
    normal-world q/k, inject under cmajor, compare against the normal-world
    injected pass."""
    unet, params, x, t, ctx = unet_setup
    src = unet.apply(params, x[:1], t[:1], ctx[:1], collect_injection=True)
    taps = src["taps"]
    qk = {k: v for k, v in taps.items() if k.endswith(".attn1.q") or k.endswith(".attn1.k")}
    assert qk
    ref = np.asarray(unet.apply(params, x, t, ctx, injection=qk))
    monkeypatch.setenv("DIFFMINING_TF_CMAJOR", "1")
    src_cm = unet.apply(params, x[:1], t[:1], ctx[:1], collect_injection=True)
    for k, v in qk.items():
        assert src_cm["taps"][k].shape == v.shape  # canonical layout contract
    out = np.asarray(unet.apply(params, x, t, ctx, injection=qk))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(TINY_VAE)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), img, method=AutoencoderKL.encode_decode)
    mean, logvar = vae.apply(params, img)
    # 2 blocks -> one downsample -> /2 spatial, latent_channels=4
    assert mean.shape == (1, 16, 16, 4) and logvar.shape == (1, 16, 16, 4)
    z = sample_latent(mean, logvar, jax.random.PRNGKey(2), TINY_VAE.scaling_factor)
    dec = vae.apply(params, z, method=AutoencoderKL.decode)
    assert dec.shape == img.shape


def test_vae_sample_latent_statistics():
    """sample_latent implements mean + std*eps scaled by scaling_factor
    (reference compute.py:91-93 semantics)."""
    mean = jnp.zeros((1, 8, 8, 4))
    logvar = jnp.zeros((1, 8, 8, 4))  # std == 1
    zs = [
        np.asarray(sample_latent(mean, logvar, jax.random.PRNGKey(i), 0.18215))
        for i in range(16)
    ]
    z = np.stack(zs)
    assert abs(z.mean()) < 0.02
    np.testing.assert_allclose(z.std(), 0.18215, rtol=0.05)


def test_clip_text_causal():
    """Causality: token at position p must not affect hidden states before p."""
    clip = CLIPTextModel(TINY_CLIP_TEXT)
    ids = jnp.array([[1, 2, 3, 4, 5] + [0] * 72], dtype=jnp.int32)
    params = clip.init(jax.random.PRNGKey(0), ids)
    h1 = clip.apply(params, ids)
    ids2 = ids.at[0, 4].set(99)
    h2 = clip.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(h1[0, :4]), np.asarray(h2[0, :4]), rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(h1[0, 4]) - np.asarray(h2[0, 4])).max() > 1e-6


def test_group_norm_fast_matches_flax():
    """ops/norm.py group_norm_fast (lane-aligned two-stage stats, the TPU bf16
    path) must match nn.GroupNorm: fp32 to reassociation precision, bf16 to
    output rounding (the graphs differ only in summation order)."""
    import flax.linen as nn

    from diffmining_tpu.ops.norm import GroupNormFast, group_norm, group_norm_fast

    rng = np.random.RandomState(3)
    for (B, H, W, C, G, eps) in [(2, 16, 16, 320, 32, 1e-5), (2, 5, 7, 64, 8, 1e-6)]:
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 3 + 1.5)
        scale = jnp.asarray(rng.randn(C).astype(np.float32))
        bias = jnp.asarray(rng.randn(C).astype(np.float32))
        p = {"params": {"scale": scale, "bias": bias}}
        ref = nn.GroupNorm(num_groups=G, epsilon=eps).apply(p, x)
        fast = group_norm_fast(x, scale, bias, G, eps)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=5e-5, rtol=1e-5)
        # bf16: agree with flax's own bf16 kernel to 1 ulp on a small fraction
        xb = x.astype(jnp.bfloat16)
        refb = nn.GroupNorm(num_groups=G, epsilon=eps, dtype=jnp.bfloat16).apply(p, xb)
        fastb = group_norm_fast(xb, scale, bias, G, eps)
        assert fastb.dtype == jnp.bfloat16
        d = np.abs(np.asarray(refb, np.float32) - np.asarray(fastb, np.float32))
        rel = d.max() / np.abs(np.asarray(refb, np.float32)).max()
        assert rel < 5e-3, rel
    # the factory: identical param trees on both paths
    m_fast = GroupNormFast(num_groups=G, epsilon=eps)
    v = m_fast.init(jax.random.PRNGKey(0), x)
    ref_m = nn.GroupNorm(num_groups=G, epsilon=eps)
    v_ref = ref_m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_ref)
    assert group_norm(G, eps, jnp.float32, "n").__class__ is nn.GroupNorm
    assert group_norm(G, eps, jnp.bfloat16, "n").__class__ is GroupNormFast
