"""CLIP text encoder (and vision tower for the CLIP-mining baseline), flax.

From-scratch replacement for transformers' CLIPTextModel which the reference
uses as the SD conditioning encoder (reference: diffmining/typicality/
compute.py:19,51, finetuning/cars.py:120) and — via StreetCLIP — for the geo
domain (finetuning/geo.py:51). Both openai/clip-vit-large-patch14-336 and
geolocal/StreetCLIP share this architecture (ViT-L: hidden 768, 12 text
layers); weights convert via utils/weights.py.

The text encoder output used by SD is `last_hidden_state` (post final-LN),
[B, 77, 768]. The vision tower (for clipmining/ranking.py parity) exposes all
patch-token hidden states plus the projected embeddings.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffmining_tpu.ops.attention import merge_heads, sdpa, split_heads


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


CLIP_VIT_L_TEXT = CLIPTextConfig()

TINY_CLIP_TEXT = CLIPTextConfig(
    vocab_size=1000, hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2
)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


CLIP_VIT_L_VISION_336 = CLIPVisionConfig()

TINY_CLIP_VISION = CLIPVisionConfig(
    image_size=64, patch_size=8, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=2, projection_dim=16,
)


def _torch_bicubic_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] interpolation matrix reproducing torch
    F.interpolate(mode="bicubic", align_corners=False) exactly (cubic kernel
    a=-0.75, half-pixel centers, border-replicate). jax.image.resize's
    bicubic is the Catmull-Rom kernel (a=-0.5) — numerically different."""
    import numpy as np

    a = -0.75

    def k(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * (x**3 - 5 * x**2 + 8 * x - 4)
        return 0.0

    W = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        src = (i + 0.5) * in_size / out_size - 0.5
        j0 = int(np.floor(src))
        frac = src - j0
        for t in range(-1, 3):
            W[i, min(max(j0 + t, 0), in_size - 1)] += k(t - frac)
    return jnp.asarray(W)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)  # torch GELU is exact erf
    raise ValueError(name)


class CLIPMLP(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.config.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = _act(self.config.hidden_act)(h)
        return nn.Dense(self.config.hidden_size, dtype=self.dtype, name="fc2")(h)


class CLIPAttention(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q, k, v = (split_heads(a, cfg.num_heads) for a in (q, k, v))
        out = sdpa(q, k, v, mask=mask)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(merge_heads(out))


class CLIPEncoderLayer(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=self.config.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.config, dtype=self.dtype, name="self_attn")(h.astype(self.dtype), mask)
        h = nn.LayerNorm(epsilon=self.config.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        return x + CLIPMLP(self.config, dtype=self.dtype, name="mlp")(h.astype(self.dtype))


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIP_VIT_L_TEXT
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """input_ids [B, 77] int32 -> last_hidden_state [B, 77, hidden]."""
        cfg = self.config
        b, l = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (cfg.max_position_embeddings, cfg.hidden_size)
        )
        x = tok + pos[None, :l].astype(self.dtype)
        causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x).astype(
            self.dtype
        )


class CLIPVisionModel(nn.Module):
    """ViT vision tower; returns (pooled_proj, patch_tokens_proj).

    patch_tokens_proj are all vision tokens pushed through visual_projection,
    which is what the CLIP-mining baseline scores per-patch
    (reference: clipmining/ranking.py:62-66).
    """

    config: CLIPVisionConfig = CLIP_VIT_L_VISION_336
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        b, h, w, c = pixels.shape
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size), strides=cfg.patch_size,
            padding="VALID", use_bias=False, dtype=self.dtype, name="patch_embedding",
        )(pixels.astype(self.dtype))
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x], axis=1)
        g0 = cfg.image_size // cfg.patch_size
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (g0 * g0 + 1, cfg.hidden_size))
        if (gh, gw) != (g0, g0):
            # Learned position embeddings bind the tower to its training grid
            # (the reference's 336px center-crop limit, clipmining/README.md);
            # bicubic interpolation of the patch-grid embeddings (transformers'
            # interpolate_pos_encoding) extends it to other input sizes.
            # Shapes are static, so this resolves at trace time.
            grid0 = pos[1:].reshape(g0, g0, cfg.hidden_size).astype(jnp.float32)
            wr, wc = _torch_bicubic_matrix(g0, gh), _torch_bicubic_matrix(g0, gw)
            grid = jnp.einsum("ij,jkc->ikc", wr, jnp.einsum("kl,jlc->jkc", wc, grid0))
            grid = grid.reshape(gh * gw, cfg.hidden_size)
            pos = jnp.concatenate([pos[:1].astype(jnp.float32), grid], axis=0)
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(x).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        post = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(x).astype(self.dtype)
        proj = self.param("visual_projection", nn.initializers.normal(0.02), (cfg.hidden_size, cfg.projection_dim))
        pooled = post[:, 0] @ proj.astype(self.dtype)
        tokens = post[:, 1:] @ proj.astype(self.dtype)
        return pooled, tokens


class CLIPTextModelWithProjection(nn.Module):
    """Text tower + text_projection + pooled embedding (for clipmining)."""

    config: CLIPTextConfig = CLIP_VIT_L_TEXT
    projection_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, eos_token_id: int = 49407):
        hidden = CLIPTextModel(self.config, dtype=self.dtype, name="text_model")(input_ids)
        # pooled = hidden state at the eos token (highest id = argmax trick)
        eos_idx = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(hidden, eos_idx[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (self.config.hidden_size, self.projection_dim)
        )
        return hidden, pooled @ proj.astype(self.dtype)
