"""Pallas fused GroupNorm→SiLU→1x1-matmul for the UNet's hot norm chains.

The SURVEY §7 step-2 experiment: XLA compiles GN-stats (read x) → a
normalize+SiLU fusion (read x, write y) → conv (read y); fusing the
normalize+SiLU+1x1-projection into one Pallas kernel removes the y
round-trip — at SD-v1.5 512px level 0 that intermediate is
[B,64,64,320]×2 passes of HBM per SpatialTransformer entry.

Scope: the 1x1 case only (SpatialTransformer proj_in). 3x3 convs stay on
XLA — a competitive spatial conv would re-implement XLA's conv emitter for
at best the same HBM math. Stats are computed by XLA (one cheap fused
reduce); the kernel consumes precomputed per-(batch,group) mean/rsigma.

Measured on v5e — see BENCH_NOTES.md "Fused GroupNorm+SiLU+proj_in" —
and auto-disabled unless DIFFMINING_FUSED_NORM=1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_act_matmul_kernel(x_ref, stat_ref, gb_ref, w_ref, o_ref, *, act):
    # x [rows, C]; stat [2, C] rows = (mean, rsigma) broadcast per channel for
    # THIS batch entry; gb [2, C] = (gamma, beta); w [C, Cout]
    x = x_ref[0].astype(jnp.float32)
    mean = stat_ref[0, 0:1]
    rsig = stat_ref[0, 1:2]
    gamma = gb_ref[0:1]
    beta = gb_ref[1:2]
    h = (x - mean) * rsig * gamma + beta
    if act == "silu":
        h = h * jax.nn.sigmoid(h)
    o_ref[0] = jax.lax.dot_general(
        h.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def gn_act_proj(
    x: jax.Array,  # [B, H, W, C]
    gamma: jax.Array,  # [C]
    beta: jax.Array,  # [C]
    w: jax.Array,  # [C, Cout] (1x1 conv kernel squeezed)
    bias: jax.Array,  # [Cout]
    groups: int,
    eps: float = 1e-6,
    block_rows: int = 512,
    act: str = "none",
) -> jax.Array:
    """GroupNorm(groups, eps) → optional SiLU → 1x1 projection, one fused
    kernel pass. act="none" is the SpatialTransformer entry (GN → proj_in,
    diffusers has no activation there); act="silu" the generic chain.

    Stats are computed by XLA (fp32); the Pallas kernel streams x once and
    writes the projected output directly. Forward-only (no custom VJP) — the
    UNet enables it via UNetConfig.fused_norm on inference paths only.
    """
    b, hh, ww, c = x.shape
    n = hh * ww
    cout = w.shape[1]
    xf = x.reshape(b, n, c)

    # per-(batch, group) stats in fp32 — one fused XLA reduce over x
    xg = xf.astype(jnp.float32).reshape(b, n, groups, c // groups)
    mean_g = xg.mean(axis=(1, 3))  # [B, G]
    var_g = xg.var(axis=(1, 3))
    rsig_g = jax.lax.rsqrt(var_g + eps)
    # broadcast to per-channel rows [B, 2, C]
    mean_c = jnp.repeat(mean_g, c // groups, axis=1)
    rsig_c = jnp.repeat(rsig_g, c // groups, axis=1)
    stats = jnp.stack([mean_c, rsig_c], axis=1)  # [B, 2, C]
    gb = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)], axis=0)  # [2, C]

    rows = block_rows
    n_pad = (-n) % rows
    if n_pad:
        xf = jnp.pad(xf, ((0, 0), (0, n_pad), (0, 0)))
    n_p = xf.shape[1]

    out = pl.pallas_call(
        functools.partial(_gn_act_matmul_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((b, n_p, cout), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, n_p // rows),
            in_specs=[
                pl.BlockSpec((1, rows, c), lambda bb, i: (bb, i, 0)),
                pl.BlockSpec((1, 2, c), lambda bb, i: (bb, 0, 0)),
                pl.BlockSpec((2, c), lambda bb, i: (0, 0)),
                pl.BlockSpec((c, cout), lambda bb, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, cout), lambda bb, i: (bb, i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(xf, stats, gb, w)
    out = out[:, :n] + bias.astype(out.dtype)[None, None]
    return out.reshape(b, hh, ww, cout)


def gn_act_proj_xla(x, gamma, beta, w, bias, groups, eps=1e-6, act="none"):
    """Reference XLA chain for the microbenchmark."""
    b, hh, ww, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, hh * ww, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, hh, ww, c)
    h = h * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "silu":
        h = h * jax.nn.sigmoid(h)
    h = h.astype(x.dtype)
    return h.reshape(b, hh * ww, c) @ w + bias[None, None]
