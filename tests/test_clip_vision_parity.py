"""CLIP vision tower parity vs transformers (the torch stack the reference's
clipmining baseline runs on, reference clipmining/ranking.py:20-24,62-66).

Random transformers weights converted through utils/weights.convert_clip_vision
must reproduce (a) the projected patch tokens the baseline scores —
visual_projection(post_layernorm(last_hidden_state[:, 1:])) — and (b) the
pooled image embedding, at native input size AND at a different input size via
position-embedding interpolation (transformers interpolate_pos_encoding,
matched bit-for-bit by the torch-bicubic matrices in models/clip.py).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from diffmining_tpu.models.clip import CLIPVisionConfig, CLIPVisionModel
from diffmining_tpu.utils.weights import convert_clip_vision

HID, LAYERS, HEADS, PROJ = 32, 2, 2, 16
IMG, PATCH = 32, 8


@pytest.fixture(scope="module")
def towers():
    torch.manual_seed(0)
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=IMG, patch_size=PATCH, hidden_size=HID, intermediate_size=64,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS, projection_dim=PROJ,
        hidden_act="quick_gelu",
    )
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    ours = CLIPVisionModel(
        CLIPVisionConfig(
            image_size=IMG, patch_size=PATCH, hidden_size=HID, intermediate_size=64,
            num_layers=LAYERS, num_heads=HEADS, projection_dim=PROJ,
        )
    )
    params = {"params": convert_clip_vision({k: v.numpy() for k, v in hf.state_dict().items()})}
    return hf, ours, params


def _want(hf, pixels, interpolate=False):
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(pixels), interpolate_pos_encoding=interpolate)
        # the baseline's per-patch features (reference ranking.py:62-66)
        tokens = hf.visual_projection(
            hf.vision_model.post_layernorm(out.last_hidden_state[:, 1:])
        ).numpy()
        return out.image_embeds.numpy(), tokens


def test_vision_parity_native_size(towers):
    hf, ours, params = towers
    pixels = np.random.RandomState(0).randn(2, 3, IMG, IMG).astype(np.float32)
    want_pooled, want_tokens = _want(hf, pixels)
    pooled, tokens = ours.apply(params, jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tokens), want_tokens, rtol=2e-4, atol=2e-5)


def test_vision_parity_interpolated_positions(towers):
    """Input 48px on a 32px-trained tower: the 4x4 position grid interpolates
    to 6x6. This is the path that lets clipmining run crops other than the
    tower's native size (the reference could not, clipmining/README.md)."""
    hf, ours, params = towers
    pixels = np.random.RandomState(1).randn(1, 3, 48, 48).astype(np.float32)
    want_pooled, want_tokens = _want(hf, pixels, interpolate=True)
    pooled, tokens = ours.apply(params, jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    assert tokens.shape == want_tokens.shape == (1, 36, PROJ)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(tokens), want_tokens, rtol=2e-3, atol=2e-4)
