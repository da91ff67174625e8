"""Hand transcription of the diffusers SD UNet/VAE forward in plain torch.

This is the parity ORACLE for our flax models (models/unet.py, models/vae.py):
an independent line-by-line transcription of the diffusers semantics the
reference depends on — UNet2DConditionModel's block structure, skip-connection
pops, GEGLU feed-forward, timestep plumbing, per-block head dims, and the VAE
encoder/decoder — written so that `state_dict()` keys exactly match the
diffusers checkpoint naming. That lets the real weight converter
(diffmining_tpu/utils/weights.py convert_unet/convert_vae) consume these
modules directly, so the tests exercise the converter's rename/transpose rules
AND the flax wiring in one shot.

Spec sources (semantics only; no code copied):
  * reference diffmining/typicality/dift.py:23-169 — the reference's own
    re-implementation of the full UNet forward (down/mid/up loops, the
    `down_block_res_samples[-len(resnets):]` skip pops, upsample-size
    forwarding for non-multiple-of-2^k inputs, up_ft tap after each full
    up-block).
  * diffusers @ the reference's pin: ResnetBlock2D (GN eps 1e-5 -> SiLU ->
    conv1 -> +time_emb_proj(SiLU(temb)) -> GN -> SiLU -> conv2 -> +shortcut),
    Transformer2DModel (GN eps 1e-6 -> 1x1 proj_in -> BasicTransformerBlocks
    -> 1x1 proj_out -> +residual), BasicTransformerBlock (pre-LN, self-attn,
    cross-attn, GEGLU FF), Downsample2D (stride-2 conv pad 1; VAE variant pads
    (0,1,0,1) then VALID), Upsample2D (nearest 2x -> conv3x3).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------


def timestep_embedding(t: torch.Tensor, dim: int, flip_sin_to_cos=True, freq_shift=0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / (half - freq_shift))
    args = t.float()[:, None] * freqs[None]
    sin, cos = torch.sin(args), torch.cos(args)
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_ch: Optional[int], groups: int, eps: float):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch is not None:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class Attention(nn.Module):
    """Multi-head attention, diffusers layout: to_q/k/v bias-free, to_out.0."""

    def __init__(self, query_dim: int, cross_dim: Optional[int], heads: int, dim_head: int):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(cross_dim or query_dim, inner, bias=False)
        self.to_v = nn.Linear(cross_dim or query_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim), nn.Dropout(0.0))

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, lq = x.shape[:2]
        q = self.to_q(x).view(b, lq, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], self.heads, self.dim_head).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.dim_head), dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, lq, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        self.net = nn.ModuleList([GEGLU(dim, dim * mult), nn.Dropout(0.0), nn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, dim_head: int, cross_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, None, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, cross_dim, heads, dim_head)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    def __init__(self, ch: int, heads: int, cross_dim: int, depth: int, groups: int):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, ch // heads, cross_dim) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            y = blk(y, context)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class Downsample2D(nn.Module):
    def __init__(self, ch: int, asymmetric_pad: bool = False):
        super().__init__()
        self.asymmetric_pad = asymmetric_pad
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0 if asymmetric_pad else 1)

    def forward(self, x):
        if self.asymmetric_pad:  # VAE encoder variant
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x, out_size=None):
        if out_size is None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        else:
            x = F.interpolate(x, size=out_size, mode="nearest")
        return self.conv(x)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


class _DownBlock(nn.Module):
    """CrossAttnDownBlock2D / DownBlock2D."""

    def __init__(self, in_ch, out_ch, temb_ch, layers, has_attn, heads, cross_dim, groups, add_downsample, depth=1):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_ch, groups, 1e-5) for j in range(layers)]
        )
        self.attentions = (
            nn.ModuleList([Transformer2DModel(out_ch, heads, cross_dim, depth, groups) for _ in range(layers)])
            if has_attn
            else None
        )
        self.downsamplers = nn.ModuleList([Downsample2D(out_ch)]) if add_downsample else None

    def forward(self, x, temb, context):
        states = ()
        for j, res in enumerate(self.resnets):
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, context)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_ch, heads, cross_dim, groups, depth=1):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_ch, groups, 1e-5), ResnetBlock2D(ch, ch, temb_ch, groups, 1e-5)]
        )
        self.attentions = nn.ModuleList([Transformer2DModel(ch, heads, cross_dim, depth, groups)])

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class _UpBlock(nn.Module):
    """CrossAttnUpBlock2D / UpBlock2D. Skip channels follow diffusers:
    resnet j consumes skip j counted from the END of the down stack."""

    def __init__(self, in_ch, prev_ch, out_ch, temb_ch, layers, has_attn, heads, cross_dim, groups, add_upsample, depth=1):
        super().__init__()
        resnets = []
        for j in range(layers):
            skip_ch = in_ch if j == layers - 1 else out_ch
            res_in = prev_ch if j == 0 else out_ch
            resnets.append(ResnetBlock2D(res_in + skip_ch, out_ch, temb_ch, groups, 1e-5))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = (
            nn.ModuleList([Transformer2DModel(out_ch, heads, cross_dim, depth, groups) for _ in range(layers)])
            if has_attn
            else None
        )
        self.upsamplers = nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None

    def forward(self, x, temb, context, res_tuple, upsample_size=None):
        for j, res in enumerate(self.resnets):
            skip = res_tuple[-1]
            res_tuple = res_tuple[:-1]
            x = res(torch.cat([x, skip], dim=1), temb)
            if self.attentions is not None:
                x = self.attentions[j](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, upsample_size)
        return x


class UNet2DConditionRef(nn.Module):
    """Tiny-configurable diffusers-UNet transcription (NCHW, fp32)."""

    def __init__(
        self,
        in_channels: int = 4,
        out_channels: int = 4,
        block_out_channels: Sequence[int] = (32, 64, 64),
        layers_per_block: int = 2,
        cross_attention_dim: int = 32,
        num_attention_heads: int = 4,
        down_block_has_attn: Sequence[bool] = (True, True, False),
        norm_num_groups: int = 8,
        transformer_layers: int = 1,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
    ):
        super().__init__()
        bo = tuple(block_out_channels)
        temb_ch = bo[0] * 4
        self.bo = bo
        self.flip_sin_to_cos = flip_sin_to_cos
        self.freq_shift = freq_shift
        self.time_embedding = TimestepEmbedding(bo[0], temb_ch)
        self.conv_in = nn.Conv2d(in_channels, bo[0], 3, padding=1)

        self.down_blocks = nn.ModuleList()
        ch = bo[0]
        for i, out_ch in enumerate(bo):
            self.down_blocks.append(
                _DownBlock(
                    ch, out_ch, temb_ch, layers_per_block, down_block_has_attn[i],
                    num_attention_heads, cross_attention_dim, norm_num_groups,
                    add_downsample=i < len(bo) - 1, depth=transformer_layers,
                )
            )
            ch = out_ch

        self.mid_block = _MidBlock(
            bo[-1], temb_ch, num_attention_heads, cross_attention_dim, norm_num_groups,
            depth=transformer_layers,
        )

        # diffusers up-block channel plumbing (unet_2d_condition.py):
        #   reversed = bo[::-1]; prev = reversed[0]
        #   block i: out = reversed[i]; in(skip base) = reversed[min(i+1, n-1)]
        self.up_blocks = nn.ModuleList()
        rev = bo[::-1]
        up_attn = tuple(reversed(down_block_has_attn))
        prev = rev[0]
        for i, out_ch in enumerate(rev):
            in_ch = rev[min(i + 1, len(bo) - 1)]
            self.up_blocks.append(
                _UpBlock(
                    in_ch, prev, out_ch, temb_ch, layers_per_block + 1, up_attn[i],
                    num_attention_heads, cross_attention_dim, norm_num_groups,
                    add_upsample=i < len(bo) - 1, depth=transformer_layers,
                )
            )
            prev = out_ch

        self.conv_norm_out = nn.GroupNorm(norm_num_groups, bo[0], eps=1e-5)
        self.conv_out = nn.Conv2d(bo[0], out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states, up_ft_indices: Tuple[int, ...] = ()):
        up_factor = 2 ** (len(self.bo) - 1)
        forward_upsample_size = any(s % up_factor != 0 for s in sample.shape[-2:])

        t_emb = timestep_embedding(
            timesteps.expand(sample.shape[0]), self.bo[0], self.flip_sin_to_cos, self.freq_shift
        )
        temb = self.time_embedding(t_emb)
        x = self.conv_in(sample)

        skips = (x,)
        for blk in self.down_blocks:
            x, states = blk(x, temb, encoder_hidden_states)
            skips += states

        x = self.mid_block(x, temb, encoder_hidden_states)

        up_ft = {}
        for i, blk in enumerate(self.up_blocks):
            n = len(blk.resnets)
            res_tuple, skips = skips[-n:], skips[:-n]
            upsample_size = skips[-1].shape[2:] if (skips and forward_upsample_size) else None
            x = blk(x, temb, encoder_hidden_states, res_tuple, upsample_size)
            if i in up_ft_indices:
                up_ft[i] = x

        eps = self.conv_out(F.silu(self.conv_norm_out(x)))
        if up_ft_indices:
            return eps, up_ft
        return eps


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


class _VAEAttention(nn.Module):
    """Single-head spatial self-attention (diffusers Attention in the VAE
    mid-block, modern to_q/to_k/to_v naming)."""

    def __init__(self, ch: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.Sequential(nn.Linear(ch, ch), nn.Dropout(0.0))

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        wts = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
        y = self.to_out(wts @ v)
        return x + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, groups, 1e-6), ResnetBlock2D(ch, ch, None, groups, 1e-6)]
        )
        self.attentions = nn.ModuleList([_VAEAttention(ch, groups)])

    def forward(self, x):
        return self.resnets[1](self.attentions[0](self.resnets[0](x)))


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None, groups, 1e-6) for j in range(layers)]
        )
        self.downsamplers = nn.ModuleList([Downsample2D(out_ch, asymmetric_pad=True)]) if add_downsample else None

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None, groups, 1e-6) for j in range(layers)]
        )
        self.upsamplers = nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class _VAEEncoder(nn.Module):
    def __init__(self, in_channels, bo, layers, groups, latent_ch):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, bo[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = bo[0]
        for i, out_ch in enumerate(bo):
            self.down_blocks.append(_VAEDownBlock(ch, out_ch, layers, groups, add_downsample=i < len(bo) - 1))
            ch = out_ch
        self.mid_block = _VAEMid(bo[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, bo[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(bo[-1], 2 * latent_ch, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class _VAEDecoder(nn.Module):
    def __init__(self, out_channels, bo, layers, groups, latent_ch):
        super().__init__()
        rev = bo[::-1]
        self.conv_in = nn.Conv2d(latent_ch, rev[0], 3, padding=1)
        self.mid_block = _VAEMid(rev[0], groups)
        self.up_blocks = nn.ModuleList()
        ch = rev[0]
        for i, out_ch in enumerate(rev):
            self.up_blocks.append(_VAEUpBlock(ch, out_ch, layers + 1, groups, add_upsample=i < len(bo) - 1))
            ch = out_ch
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], out_channels, 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKLRef(nn.Module):
    def __init__(self, in_channels=3, out_channels=3, latent_channels=4,
                 block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4,
                 scaling_factor=0.18215):
        super().__init__()
        self.scaling_factor = scaling_factor
        self.encoder = _VAEEncoder(in_channels, tuple(block_out_channels), layers_per_block, norm_num_groups, latent_channels)
        self.decoder = _VAEDecoder(out_channels, tuple(block_out_channels), layers_per_block, norm_num_groups, latent_channels)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z_scaled):
        return self.decoder(self.post_quant_conv(z_scaled / self.scaling_factor))
