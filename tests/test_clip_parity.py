"""Activation-parity of our CLIP text encoder vs transformers' torch model.

This is the per-module parity harness SURVEY.md §7 calls for (hard part 1):
random torch weights converted through utils/weights.convert_clip_text must
reproduce torch outputs to fp32 tolerance. Run on a tiny config for speed —
the conversion path is identical for ViT-L.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from diffmining_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from diffmining_tpu.utils.weights import convert_clip_text


@pytest.mark.parametrize("hidden_act", ["quick_gelu", "gelu"])
def test_clip_text_parity(hidden_act):
    torch.manual_seed(0)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=77,
        hidden_act=hidden_act,
    )
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    ids = torch.randint(0, 128, (3, 77))
    with torch.no_grad():
        want = hf(ids).last_hidden_state.numpy()

    tensors = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_clip_text(tensors)}
    ours = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, hidden_act=hidden_act,
        )
    )
    got = np.asarray(ours.apply(params, jnp.asarray(ids.numpy(), dtype=jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
