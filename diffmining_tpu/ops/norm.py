"""GroupNorm with TPU-fast statistics (lane-aligned two-stage reduction).

Why this exists (measured, BENCH_NOTES.md "GroupNorm stats"): flax's
``nn.GroupNorm`` reshapes to ``(..., groups, C//groups)`` and reduces over
``(spatial, C//groups)``. On TPU the channel dim lives in the 128-wide vector
lanes, and a reduction over a 10-lane slice of them (SD-v1.5: C=320, 32
groups) breaks lane alignment — the op-level profile shows these
``convert_reduce_fusion``s running at ~226 GB/s, 27% of HBM peak, 25% of the
whole UNet pass.

The fix is a pure reassociation, entirely inside XLA (no Pallas call, so no
fusion barrier): first reduce over the spatial axis only — a lane-aligned
``(B, N, C) -> (B, C)`` multi-output fusion computing sum(x) and sum(x*x) in
ONE pass over the activation at full bandwidth — then combine the tiny
``(B, C)`` partials into per-group statistics. Same math as flax
(var = E[x^2] - E[x]^2, fp32 stats, output cast to module dtype); only the
summation order differs.

``group_norm(...)`` is the call-site factory: it returns flax's own
``nn.GroupNorm`` on the fp32 path (CPU tests / parity oracles stay
bit-for-bit) and ``GroupNormFast`` on the bf16 TPU path — both register the
identical "scale"/"bias" fp32 per-channel params under the same module name,
so checkpoints and the weight converter (utils/weights.py) are unaffected.
Override the dispatch with ``DIFFMINING_GN_STATS=flax|fast``.

Reference counterpart: torch ``nn.GroupNorm`` inside every diffusers
ResnetBlock2D/Transformer2DModel (SURVEY.md C9; cuDNN provides the fused
kernel there).
"""
from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def group_norm_fast(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    epsilon: float,
) -> jax.Array:
    """GroupNorm with two-stage (lane-aligned) fp32 statistics.

    x: (B, *spatial, C); scale/bias: (C,). Returns x.dtype.
    """
    B, C = x.shape[0], x.shape[-1]
    cg = C // num_groups
    n = 1
    for d in x.shape[1:-1]:
        n *= d
    xr = x.reshape(B, n, C)
    x32 = xr.astype(jnp.float32)
    # ONE fused pass over the activation: sibling reductions share the read
    s1 = jnp.sum(x32, axis=1)
    s2 = jnp.sum(x32 * x32, axis=1)
    # tiny (B, C) -> (B, G) group combine
    denom = float(n * cg)
    mu = s1.reshape(B, num_groups, cg).sum(-1) / denom
    ms = s2.reshape(B, num_groups, cg).sum(-1) / denom
    var = ms - mu * mu
    rstd = jax.lax.rsqrt(var + epsilon)
    # per-channel affine folded into the per-group stats (fp32), applied in
    # one elementwise pass that XLA fuses with the consumer
    mu_c = jnp.repeat(mu, cg, axis=1)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    w = rstd_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mu_c * w
    shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = x.astype(jnp.float32) * w.reshape(shape) + b.reshape(shape)
    return y.astype(x.dtype)


class GroupNormFast(nn.Module):
    """``nn.GroupNorm``-compatible module using :func:`group_norm_fast`.

    Same param names/shapes as flax ("scale"/"bias", fp32, per-channel).
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm_fast(x, scale, bias, self.num_groups, self.epsilon)


def group_norm(num_groups: int, epsilon: float, dtype: Any, name: str):
    """Call-site factory: fast stats on the bf16 (TPU) path, flax elsewhere."""
    mode = os.environ.get("DIFFMINING_GN_STATS", "auto")
    fast = (dtype == jnp.bfloat16) if mode == "auto" else (mode == "fast")
    cls = GroupNormFast if fast else nn.GroupNorm
    return cls(num_groups=num_groups, epsilon=epsilon, dtype=dtype, name=name)
