"""SD-v1.5 AutoencoderKL (encoder + decoder), flax/NHWC.

From-scratch replacement for the diffusers AutoencoderKL the reference uses for
`vae.encode(x).latent_dist.sample() * scaling_factor` (reference:
diffmining/typicality/compute.py:91-93) and `vae.decode` in PnP
(applications/parallel-dataset/pnp.py). The mid-block single-head attention is
plain SDPA over the 512-channel feature map.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn

from diffmining_tpu.ops.norm import group_norm
import jax
import jax.numpy as jnp

from diffmining_tpu.ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


SD15_VAE = VAEConfig()

TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = group_norm(self.groups, 1e-6, self.dtype, "norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = group_norm(self.groups, 1e-6, self.dtype, "norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over the spatial map (diffusers Attention)."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        res = x
        y = group_norm(self.groups, 1e-6, self.dtype, "group_norm")(x)
        y = y.astype(self.dtype).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        out = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return res + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig = SD15_VAE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, name=f"down_{i}_res_{j}")(x)
            if i < n - 1:
                # diffusers Downsample2D in the VAE pads (0,1,0,1) then convs VALID
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=2, padding="VALID", dtype=self.dtype, name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_res_0")(x)
        x = VAEAttention(ch, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(x)
        x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_res_1")(x)
        x = group_norm(cfg.norm_num_groups, 1e-6, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig = SD15_VAE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        x = VAEResnet(rev[0], groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_res_0")(x)
        x = VAEAttention(rev[0], groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(x)
        x = VAEResnet(rev[0], groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_res_1")(x)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=self.dtype, name=f"up_{i}_res_{j}")(x)
            if i < n - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = group_norm(cfg.norm_num_groups, 1e-6, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Encode/decode; `method=` selects the path via nn.apply.

    encode(x) returns (mean, logvar) of the latent posterior; use
    `sample_latent` to draw and scale, matching the reference's
    `encode_vae` (compute.py:91-93).
    """

    config: VAEConfig = SD15_VAE
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z / self.config.scaling_factor))

    def __call__(self, x: jax.Array):  # default: encode
        return self.encode(x)

    def encode_decode(self, x: jax.Array):
        """Full autoencode pass — use as the init method so both encoder and
        decoder parameters are created: vae.init(rng, x, method=AutoencoderKL.encode_decode)."""
        mean, logvar = self.encode(x)
        return self.decode(mean * self.config.scaling_factor), mean, logvar


def sample_latent(
    mean: jax.Array, logvar: jax.Array, rng: jax.Array, scaling_factor: float = 0.18215
) -> jax.Array:
    """Reparameterized draw from the posterior, scaled for the UNet."""
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(rng, mean.shape, dtype=jnp.float32)
    return ((mean.astype(jnp.float32) + std * eps) * scaling_factor).astype(mean.dtype)
