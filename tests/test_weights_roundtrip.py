"""Weight conversion round-trip: our pytree -> diffusers names -> back must be
identical, for UNet, VAE and CLIP (catches rename/transpose drift on both
paths — the contract that makes our exports drop-in for the reference)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffmining_tpu.models.clip import CLIPTextModel, TINY_CLIP_TEXT
from diffmining_tpu.models.unet import TINY_UNET, UNet2DCondition
from diffmining_tpu.models.vae import TINY_VAE, AutoencoderKL
from diffmining_tpu.utils.export import unconvert_clip_text, unconvert_unet, unconvert_vae
from diffmining_tpu.utils.weights import convert_clip_text, convert_unet, convert_vae


def _assert_tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), f"{path}: {sorted(a)} vs {sorted(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=path + "/" + str(k))


def test_unet_roundtrip():
    unet = UNet2DCondition(TINY_UNET)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 32))
    )
    torch_sd = unconvert_unet(params)
    assert all(v.ndim in (1, 2, 4) for v in torch_sd.values())
    back = convert_unet(torch_sd)
    _assert_tree_equal(params["params"], back)


def test_vae_roundtrip():
    vae = AutoencoderKL(TINY_VAE)
    params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)), method=AutoencoderKL.encode_decode)
    torch_sd = unconvert_vae(params)
    back = convert_vae(torch_sd)
    _assert_tree_equal(params["params"], back)


def test_clip_roundtrip():
    clip = CLIPTextModel(TINY_CLIP_TEXT)
    params = clip.init(jax.random.PRNGKey(2), jnp.zeros((1, 77), jnp.int32))
    torch_sd = unconvert_clip_text(params)
    assert "text_model.embeddings.token_embedding.weight" in torch_sd
    back = convert_clip_text(torch_sd)
    _assert_tree_equal(params["params"], back)
