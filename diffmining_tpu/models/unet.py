"""SD-v1.5 UNet2DCondition re-designed TPU-first (flax.linen, NHWC, bf16).

From-scratch reimplementation of the eps-prediction UNet the reference loads
via diffusers (reference: diffmining/finetuning/cars.py:113, typicality/
compute.py:100). Architectural parity with the SD-v1.5 checkpoint layout so
converted HF weights drop in (utils/weights.py), but:

  * NHWC layout end-to-end (TPU convs are NHWC-native; the reference is NCHW).
  * Feature taps are explicit return values — `apply(..., up_ft_indices=(1,))`
    returns intermediate up-block activations. This replaces both the forked
    forward of the reference's DIFT (typicality/dift.py:23-169) and the
    monkey-patched module hooks of PnP (applications/parallel-dataset/
    pnp.py:275-476) with one functional code path.
  * PnP activation injection flows in as an explicit `injection` dict and the
    matching activations flow out via `collect` — no module mutation, safe
    under jit/scan.

Injection/collection keys (stable public contract, used by applications/pnp.py):
  "up.{i}.res.{j}"        — output of ResnetBlock j of up-block i
  "{path}.attn1.q" / ".k" — self-attention q/k after head-split, [B,H,L,D]
where {path} is e.g. "down.0.tf.1", "mid.tf.0", "up.1.tf.2".

An injection value may also be a `(value, gate)` tuple where `gate` is a
scalar boolean array: the activation is replaced only where the gate is true
(`jnp.where`). This lets one compiled graph serve a per-step injection
schedule — PnP scans all 50 denoise steps in a single `lax.scan` body with
the res/attn gates as scanned inputs instead of tracing one UNet per
injection regime.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from diffmining_tpu.ops.norm import group_norm
import jax
import jax.numpy as jnp

import os as _os

from diffmining_tpu.ops.attention import merge_heads, sdpa, sdpa_cbl, split_heads

Injection = Dict[str, Any]  # value, or (value, scalar-bool gate)


def _apply_injection(current: jax.Array, injected) -> jax.Array:
    """Replace `current` with the injected activation; tuple form carries a
    scalar boolean gate selecting injected vs current per call."""
    if isinstance(injected, tuple):
        value, gate = injected
        return jnp.where(gate, jnp.broadcast_to(value, current.shape).astype(current.dtype), current)
    return jnp.broadcast_to(injected, current.shape).astype(current.dtype)

# Norm output dtype follows the module compute dtype: flax computes the
# statistics in fp32 internally regardless (force_float32_reductions), and
# emitting fp32 norm outputs only to cast them back to bf16 doubles HBM
# traffic on every norm (measured +3.8% end-to-end from bf16 norm outputs).
# bf16 GroupNorm statistics (force_float32_reductions=False) were also
# measured: no throughput change (118.10 vs 118.08 passes/s) — the fp32 stat
# reduction converts fuse for free, so stats stay fp32 for accuracy.


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_attention_heads: int = 8
    # which down blocks carry spatial transformers (True) — SD1.5: first three
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    transformer_layers: int = 1
    norm_num_groups: int = 32
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    sample_size: int = 64
    # rematerialize blocks on backward (the reference's
    # --gradient_checkpointing, finetuning/cars.py:130-132)
    remat: bool = False
    # what to rematerialize (train-path MFU work, round 5):
    #   "full" — remat every resnet AND transformer block (max memory saving,
    #            recomputes the conv-heavy resnets: the round-1..4 default);
    #   "attn" — remat only the transformer blocks; resnet/conv activations
    #            are saved (convs are the FLOPs — recomputing them costs far
    #            more than the attention chain they bracket);
    #   "dots" — remat both block kinds under the dots_with_no_batch_dims
    #            policy (dot/matmul outputs saved, elementwise recomputed).
    remat_policy: str = "full"
    # fuse the SpatialTransformer entry (GroupNorm → proj_in) into one Pallas
    # pass (ops/fused_norm.py). FORWARD-ONLY (no custom VJP) — enabled by the
    # inference stack (typicality SD) on TPU; params are identical either way
    # so checkpoints interchange freely.
    fused_norm: bool = False

    @property
    def up_block_has_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_has_attn))


SD15_UNET = UNetConfig()

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=32,
    num_attention_heads=2,
    down_block_has_attn=(True, False),
    norm_num_groups=8,
    sample_size=8,
)


def timestep_embedding(
    timesteps: jax.Array, dim: int, flip_sin_to_cos: bool = True, freq_shift: int = 0, max_period: int = 10000
) -> jax.Array:
    """Sinusoidal timestep embedding, matching diffusers' Timesteps layer.

    timesteps: [B] int/float -> [B, dim] float32.
    """
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb.astype(self.dtype))
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: jax.Array,
        tap: str = "",
        injection: Optional[Injection] = None,
        collect: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        in_ch = x.shape[-1]
        h = group_norm(self.groups, 1e-5, self.dtype, "norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = group_norm(self.groups, 1e-5, self.dtype, "norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        # PnP injects the RESIDUAL BRANCH (post-conv2, pre-shortcut-add): each
        # batch entry then adds its own shortcut (reference pnp.py:345-350
        # injects hidden_states before `input_tensor + hidden_states`).
        if tap and injection is not None and tap in injection:
            h = _apply_injection(h, injection[tap])
        if tap and collect is not None:
            collect[tap] = h
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class DenseT(nn.Module):
    """nn.Dense twin for channel-major activations.

    Same param names/shapes as nn.Dense (kernel [in, features], optional bias
    [features]) so the tree is checkpoint/convert-identical; computes
    out[f, ...] = sum_c kernel[c, f] * x[..., c, ...] with the contraction on
    `contract_axis` of x and the feature dim emitted FIRST. With channel-major
    [C, B, L] inputs (contract_axis=0) the output [F, B, L] keeps the default
    layout the flash kernel wants — the dot reorients for free on the MXU
    instead of a transpose copy (round-4d HLO attribution)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    contract_axis: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[self.contract_axis]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (in_features, self.features))
        y = jax.lax.dot_general(
            kernel.astype(self.dtype), x.astype(self.dtype),
            (((0,), (self.contract_axis % x.ndim,)), ((), ())),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype).reshape((-1,) + (1,) * (y.ndim - 1))
        return y


def _injection_to_cm(injected):
    """Convert a canonical-layout injected q/k ([S, H, L, D] array or
    (value, gate) tuple) to channel-major [H*D, S, L]."""
    if isinstance(injected, tuple):
        value, gate = injected
        return (_canonical_to_cm(value), gate)
    return _canonical_to_cm(injected)


def _cm_to_canonical(a: jax.Array, heads: int) -> jax.Array:
    """[H*D, B, L] -> [B, H, L, D] (the normal-world q/k layout)."""
    hd, b, l = a.shape
    return a.reshape(heads, hd // heads, b, l).transpose(2, 0, 3, 1)


def _canonical_to_cm(a: jax.Array) -> jax.Array:
    """[S, H, L, D] -> [H*D, S, L] (S may be 1 for broadcast injection)."""
    s, h, l, d = a.shape
    return a.transpose(1, 3, 0, 2).reshape(h * d, s, l)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    Supports PnP-style q/k injection and collection via the parent-supplied
    tap name.
    """

    query_dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        tap: str = "",
        injection: Optional[Injection] = None,
        collect: Optional[Dict[str, jax.Array]] = None,
        cmajor: bool = False,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        if cmajor:
            # channel-major world: x is [C, B, L]; context (if any) stays in
            # its normal [B, Lk, C_ctx] form and the k/v projections reorient
            # it in the dot (contract_axis=-1 -> [inner, B, Lk])
            ctx_axis = 0 if context is None else -1
            ctx = x if context is None else context
            q = DenseT(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = DenseT(inner, use_bias=False, dtype=self.dtype, contract_axis=ctx_axis, name="to_k")(ctx)
            v = DenseT(inner, use_bias=False, dtype=self.dtype, contract_axis=ctx_axis, name="to_v")(ctx)
            if injection is not None and f"{tap}.q" in injection:
                q = _apply_injection(q, _injection_to_cm(injection[f"{tap}.q"]))
                k = _apply_injection(k, _injection_to_cm(injection[f"{tap}.k"]))
            if collect is not None:
                # canonical [B, H, L, D] so PnP sees world-independent shapes
                collect[f"{tap}.q"] = _cm_to_canonical(q, self.heads)
                collect[f"{tap}.k"] = _cm_to_canonical(k, self.heads)
            out = sdpa_cbl(q, k, v, self.heads)
            return DenseT(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q, k, v = (split_heads(a, self.heads) for a in (q, k, v))
        if injection is not None and f"{tap}.q" in injection:
            # PnP: every batch entry attends with the source image's q/k
            # (reference pnp.py:424-432 overwrote uncond/cond q,k with source's).
            q = _apply_injection(q, injection[f"{tap}.q"])
            k = _apply_injection(k, injection[f"{tap}.k"])
        if collect is not None:
            collect[f"{tap}.q"] = q
            collect[f"{tap}.k"] = k
        out = sdpa(q, k, v)
        out = merge_heads(out)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cmajor: bool = False) -> jax.Array:
        inner = self.dim * self.mult
        if cmajor:
            h = DenseT(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
            h, gate = jnp.split(h, 2, axis=0)
            h = h * nn.gelu(gate, approximate=False)
            return DenseT(self.dim, dtype=self.dtype, name="net_2")(h)
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # diffusers GEGLU uses exact erf gelu
        # NOTE: do NOT optimization_barrier the down-projection out of the
        # surrounding kOutput fusion. The fused [L,1280]x[1280,dim] dot shows
        # ~19% MFU in the profile, but un-fusing it (materializing the GEGLU
        # product) measured SLOWER end to end: 125.7 vs 127.0 passes/s
        # (BENCH_NOTES round-2 "fusion-shape experiments").
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    cross_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        tap: str,
        injection: Optional[Injection] = None,
        collect: Optional[Dict[str, jax.Array]] = None,
        ctx_tile: int = 1,
        cmajor: bool = False,
    ) -> jax.Array:
        # channel-major world: x is [C, B, L]; the LayerNorms normalize dim 0
        # (param shapes unchanged: one feature axis of size C either way) and
        # the batch axis for ctx_tile is 1
        ln = dict(epsilon=1e-5, dtype=self.dtype)
        if cmajor:
            ln.update(reduction_axes=0, feature_axes=0)
        batch_axis = 1 if cmajor else 0
        h = nn.LayerNorm(**ln, name="norm1")(x).astype(self.dtype)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn1")(
            h, None, tap=f"{tap}.attn1", injection=injection, collect=collect, cmajor=cmajor
        )
        if ctx_tile > 1:
            # sweep prefix dedup: everything upstream (conv_in, resnets, the
            # most expensive self-attention) ran ONCE per (image, sample);
            # conditions only diverge from the first cross-attention on, so
            # tile the batch here — entry i -> rows [i*ctx_tile, (i+1)*ctx_tile)
            # to match the engine's conditions-adjacent layout.
            x = jnp.repeat(x, ctx_tile, axis=batch_axis)
        h = nn.LayerNorm(**ln, name="norm2")(x).astype(self.dtype)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn2")(
            h, context, cmajor=cmajor
        )
        h = nn.LayerNorm(**ln, name="norm3")(x).astype(self.dtype)
        return x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h, cmajor=cmajor)


class _GNParams(nn.Module):
    """Parameter-only stand-in for nn.GroupNorm (same names/shapes)."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class _ConvParams(nn.Module):
    """Parameter-only stand-in for nn.Conv(features, (1,1))."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), (1, 1, self.in_features, self.features)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN -> 1x1 conv in -> blocks -> 1x1 conv out + res."""

    channels: int
    heads: int
    cross_dim: int
    depth: int = 1
    groups: int = 32
    dtype: Any = jnp.float32
    fused_norm: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        tap: str = "",
        injection: Optional[Injection] = None,
        collect: Optional[Dict[str, jax.Array]] = None,
        ctx_tile: int = 1,
    ) -> jax.Array:
        b, hh, ww, c = x.shape
        res = x
        if _os.environ.get("DIFFMINING_TF_CMAJOR", "0") == "1" and not self.fused_norm:
            # Channel-major transformer block (round-4 copy elimination): the
            # block runs on [C, B, L] activations so every projection's dot
            # emits the flash kernel's native layout — proj_in reorients
            # NHWC->[C',B,L] and proj_out reorients [C,B,L]->[B,L,C'] INSIDE
            # their dots, no explicit transposes anywhere (the round-4d HLO
            # attribution put ~840 MB/dispatch of copies on this block's
            # normal-world layout conflicts). DIFFMINING_TF_CMAJOR=1 enables.
            h = group_norm(self.groups, 1e-6, self.dtype, "norm")(x)
            h = h.astype(self.dtype).reshape(b, hh * ww, c)
            kern, pbias = _ConvParams(c, self.channels, name="proj_in")()
            h = jax.lax.dot_general(
                kern[0, 0].astype(self.dtype), h, (((0,), (2,)), ((), ()))
            ) + pbias.astype(self.dtype)[:, None, None]  # [C', B, L]
            dim_head = self.channels // self.heads
            for i in range(self.depth):
                h = BasicTransformerBlock(
                    self.channels, self.heads, dim_head, self.cross_dim, dtype=self.dtype,
                    name=f"transformer_blocks_{i}",
                )(
                    h, context, tap=f"{tap}.{i}", injection=injection, collect=collect,
                    ctx_tile=ctx_tile if i == 0 else 1, cmajor=True,
                )
            if ctx_tile > 1:
                b = b * ctx_tile
                res = jnp.repeat(res, ctx_tile, axis=0)
            kern2, pbias2 = _ConvParams(self.channels, self.channels, name="proj_out")()
            out = jax.lax.dot_general(
                h, kern2[0, 0].astype(self.dtype), (((0,), (0,)), ((), ()))
            ) + pbias2.astype(self.dtype)  # [B, L, C'] — the exit dot reorients
            return out.reshape(b, hh, ww, self.channels) + res
        if self.fused_norm:
            # one fused Pallas pass for GN → proj_in (no activation between
            # them in diffusers); same param tree as the module path below
            from diffmining_tpu.ops.fused_norm import gn_act_proj

            scale, gbias = _GNParams(c, name="norm")()
            kern, pbias = _ConvParams(c, self.channels, name="proj_in")()
            h = gn_act_proj(
                x, scale, gbias, kern[0, 0].astype(self.dtype), pbias,
                self.groups, eps=1e-6, act="none",
            ).astype(self.dtype)
        else:
            h = group_norm(self.groups, 1e-6, self.dtype, "norm")(x)
            h = h.astype(self.dtype)
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hh * ww, c)
        dim_head = self.channels // self.heads
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.channels, self.heads, dim_head, self.cross_dim, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(
                h, context, tap=f"{tap}.{i}", injection=injection, collect=collect,
                ctx_tile=ctx_tile if i == 0 else 1,
            )
        if ctx_tile > 1:
            # the inner block tiled the batch between attn1 and attn2; tile
            # the entry residual to match
            b = b * ctx_tile
            res = jnp.repeat(res, ctx_tile, axis=0)
        h = h.reshape(b, hh, ww, c)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + res


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.channels, (3, 3), strides=2, padding=1, dtype=self.dtype, name="conv")(x)


def nearest_resize(x: jax.Array, th: int, tw: int) -> jax.Array:
    """Nearest-neighbor resize with torch `F.interpolate(mode="nearest")`
    semantics: src = floor(dst * in/out). jax.image.resize("nearest") uses
    center-aligned rounding instead; the two agree ONLY at exact integer
    scale factors — diffusers forwards odd upsample sizes for inputs that
    aren't multiples of 2^k (reference dift.py:44-56,146-147), where they
    diverge.

    Integer scale factors (every power-of-two UNet level) take the
    broadcast-reshape path: floor(dst*in/out) == dst//s there, and the
    repeat lowers to a plain layout-preserving fusion — the gather form
    cost ~204 MB/dispatch of transpose copies at the three upsamplers
    (round-4d HLO copy attribution, BENCH_NOTES). Odd sizes keep the
    static-index gather."""
    b, h, w, c = x.shape
    if th % h == 0 and tw % w == 0:
        sh, sw = th // h, tw // w
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, sh, w, sw, c))
        return x.reshape(b, th, tw, c)
    import numpy as np

    rows = np.floor(np.arange(th) * (h / th)).astype(np.int32)
    cols = np.floor(np.arange(tw) * (w / tw)).astype(np.int32)
    return x[:, rows][:, :, cols]


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, out_size: Optional[Tuple[int, int]] = None) -> jax.Array:
        b, h, w, c = x.shape
        th, tw = out_size if out_size is not None else (h * 2, w * 2)
        x = nearest_resize(x, th, tw)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    config: UNetConfig = SD15_UNET
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, H, W, C] noisy latents (NHWC)
        timesteps: jax.Array,  # [B] or [] int32
        encoder_hidden_states: jax.Array,  # [B, 77, cross_dim]
        up_ft_indices: Tuple[int, ...] = (),
        injection: Optional[Injection] = None,
        collect_injection: bool = False,
        return_dict: bool = False,
        ctx_tile: int = 1,
    ):
        """Returns eps prediction [B,H,W,C]; with up_ft_indices also a dict of
        up-block feature maps; with collect_injection also the PnP tap dict.

        ctx_tile > 1 (sweep prefix dedup): `sample`/`timesteps` carry the
        B unique (image, sample) rows while `encoder_hidden_states` carries
        B*ctx_tile rows (conditions adjacent). The condition-independent
        prefix — conv_in, the first resnet, and the first (largest, L=H*W)
        self-attention — runs at batch B; the batch is tiled to B*ctx_tile at
        the first cross-attention, where conditions first matter. Output batch
        is B*ctx_tile. This removes the reference's duplicated prefix work
        (compute.py:134-158 tiles the noisy latent over conditions up front).
        """
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        collect: Optional[Dict[str, jax.Array]] = {} if collect_injection else None
        if ctx_tile > 1:
            assert not collect_injection, (
                "tap collection sees the pre-tile batch layout; collect with "
                "ctx_tile=1"
            )
            if injection is not None:
                # batch-1 values broadcast to whatever batch the site runs at,
                # so they are layout-independent: injecting identical pre-tile
                # rows then tiling == tiling then injecting. Anything wider
                # would bake in a row order the tile changes.
                for k, v in injection.items():
                    val = v[0] if isinstance(v, tuple) else v
                    assert val.shape[0] == 1, (
                        f"injection[{k!r}] has batch {val.shape[0]}; with "
                        "ctx_tile>1 only batch-1 values compose safely"
                    )
        # remat only applies on the plain eps path (taps/injection change the
        # block signatures and are inference-only anyway)
        use_remat = (
            cfg.remat and not collect_injection and injection is None
            and not up_ft_indices and ctx_tile == 1
        )
        Res, Tf = ResnetBlock, SpatialTransformer
        if use_remat:
            if cfg.remat_policy == "full":
                Res, Tf = nn.remat(ResnetBlock), nn.remat(SpatialTransformer)
            elif cfg.remat_policy == "attn":
                Tf = nn.remat(SpatialTransformer)
            elif cfg.remat_policy == "dots":
                pol = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                Res = nn.remat(ResnetBlock, policy=pol)
                Tf = nn.remat(SpatialTransformer, policy=pol)
            else:
                raise ValueError(
                    f"remat_policy={cfg.remat_policy!r}: expected full|attn|dots"
                )
        pending_tile = ctx_tile if ctx_tile > 1 else 0

        def res_call(mod, h, tap):
            if use_remat:
                return mod(h, temb)
            return mod(h, temb, tap=tap, injection=injection, collect=collect)

        def tf_call(mod, h, tap, tile: int = 0):
            if use_remat:
                return mod(h, context)
            return mod(
                h, context, tap=tap, injection=injection, collect=collect,
                ctx_tile=tile if tile else 1,
            )

        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding")(t_emb)
        context = encoder_hidden_states.astype(self.dtype)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            sample.astype(self.dtype)
        )

        # --- down ---
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = res_call(
                    Res(ch, groups=cfg.norm_num_groups, dtype=self.dtype, name=f"down_{i}_res_{j}"),
                    x, "",
                )
                if cfg.down_block_has_attn[i]:
                    x = tf_call(
                        Tf(
                            ch, cfg.num_attention_heads, cfg.cross_attention_dim,
                            depth=cfg.transformer_layers, groups=cfg.norm_num_groups,
                            dtype=self.dtype, fused_norm=cfg.fused_norm,
                            name=f"down_{i}_tf_{j}",
                        ),
                        x, f"down.{i}.tf.{j}", tile=pending_tile,
                    )
                    if pending_tile:
                        # the first transformer tiled the batch inside; bring
                        # temb and the already-collected skips along
                        temb = jnp.repeat(temb, pending_tile, axis=0)
                        skips = [jnp.repeat(s, pending_tile, axis=0) for s in skips]
                        pending_tile = 0
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
                skips.append(x)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        x = res_call(Res(mid_ch, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_res_0"), x, "")
        x = tf_call(
            Tf(
                mid_ch, cfg.num_attention_heads, cfg.cross_attention_dim,
                depth=cfg.transformer_layers, groups=cfg.norm_num_groups,
                dtype=self.dtype, fused_norm=cfg.fused_norm, name="mid_tf",
            ),
            x, "mid.tf", tile=pending_tile,
        )
        if pending_tile:  # no down block carried attention: tile at mid
            temb = jnp.repeat(temb, pending_tile, axis=0)
            skips = [jnp.repeat(s, pending_tile, axis=0) for s in skips]
            pending_tile = 0
        x = res_call(Res(mid_ch, groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_res_1"), x, "")

        # --- up ---
        up_ft: Dict[int, jax.Array] = {}
        rev_channels = tuple(reversed(cfg.block_out_channels))
        up_has_attn = cfg.up_block_has_attn
        for i, ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = res_call(
                    Res(ch, groups=cfg.norm_num_groups, dtype=self.dtype, name=f"up_{i}_res_{j}"),
                    x, f"up.{i}.res.{j}",
                )
                if up_has_attn[i]:
                    x = tf_call(
                        Tf(
                            ch, cfg.num_attention_heads, cfg.cross_attention_dim,
                            depth=cfg.transformer_layers, groups=cfg.norm_num_groups,
                            dtype=self.dtype, fused_norm=cfg.fused_norm,
                            name=f"up_{i}_tf_{j}",
                        ),
                        x, f"up.{i}.tf.{j}",
                    )
            if i < n_blocks - 1:
                out_size = skips[-1].shape[1:3] if skips else None
                x = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x, out_size)
            # DIFT taps the FULL up-block output, i.e. after the block's
            # upsampler (reference dift.py:134-165: `sample = upsample_block(...)`
            # runs the upsamplers inside the block, THEN `up_ft[i] = sample`).
            if i in up_ft_indices:
                up_ft[i] = x

        x = group_norm(cfg.norm_num_groups, 1e-5, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        eps = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)

        outputs: Dict[str, Any] = {"sample": eps}
        if up_ft_indices:
            outputs["up_ft"] = up_ft
        if collect_injection:
            outputs["taps"] = collect
        if return_dict or up_ft_indices or collect_injection:
            return outputs
        return eps
