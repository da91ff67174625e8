"""8-bit AdamW: blockwise-quantized optimizer state on TPU.

TPU-native replacement for bitsandbytes' 8-bit Adam which the reference
enables with --use_8bit_adam (reference: finetuning/base.py:207-232,
args.py:155-158). Both moments are stored as int8 with one fp32 scale per
256-element block (absmax quantization, bitsandbytes-style), cutting
optimizer-state HBM from 8 to ~2.03 bytes/param — for the 860M-param UNet
that is 6.8 GB -> 1.7 GB, the difference between fitting and not fitting
larger batches/resolutions next to the train state.

Dequantize -> Adam math in fp32 -> requantize, all inside the jitted update.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

_BLOCK = 256


def _quantize(x: jax.Array):
    """fp32 -> (int8 values, fp32 blockwise scales, original shape)."""
    flat = x.reshape(-1)
    pad = (-flat.size) % _BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, _BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize(q: jax.Array, scale: jax.Array, shape) -> jax.Array:
    flat = (q.astype(jnp.float32) * scale).reshape(-1)
    size = 1
    for s in shape:
        size *= s
    return flat[:size].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu_q: Any
    mu_s: Any
    nu_q: Any
    nu_s: Any


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    def init(params):
        def q_zeros(p):
            q, s = _quantize(jnp.zeros_like(p, dtype=jnp.float32))
            return q, s

        def build():
            qs = jax.tree_util.tree_map(q_zeros, params)
            is_pair = lambda t: isinstance(t, tuple)
            return (
                jax.tree_util.tree_map(lambda t: t[0], qs, is_leaf=is_pair),
                jax.tree_util.tree_map(lambda t: t[1], qs, is_leaf=is_pair),
            )

        # mu and nu must be INDEPENDENT buffers: the train step donates the
        # state, and donating the same aliased buffer twice is an error
        mu_q, mu_s = build()
        nu_q, nu_s = build()
        return Adam8bitState(jnp.zeros([], jnp.int32), mu_q, mu_s, nu_q, nu_s)

    def update(updates, state, params=None):
        count = state.count + 1

        def upd(g, mq, ms, nq, ns):
            g = g.astype(jnp.float32)
            mu = _dequantize(mq, ms, g.shape)
            nu = _dequantize(nq, ns, g.shape)
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * g * g
            mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            return step, _quantize(mu), _quantize(nu)

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_mq = treedef.flatten_up_to(state.mu_q)
        flat_ms = treedef.flatten_up_to(state.mu_s)
        flat_nq = treedef.flatten_up_to(state.nu_q)
        flat_ns = treedef.flatten_up_to(state.nu_s)
        outs = [upd(g, mq, ms, nq, ns) for g, mq, ms, nq, ns in zip(flat_u, flat_mq, flat_ms, flat_nq, flat_ns)]
        steps = treedef.unflatten([o[0] for o in outs])
        new_state = Adam8bitState(
            count,
            treedef.unflatten([o[1][0] for o in outs]),
            treedef.unflatten([o[1][1] for o in outs]),
            treedef.unflatten([o[2][0] for o in outs]),
            treedef.unflatten([o[2][1] for o in outs]),
        )
        return steps, new_state

    return optax.GradientTransformation(init, update)


def adamw_8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    """Drop-in for optax.adamw with int8 moment storage."""
    return optax.chain(
        scale_by_adam_8bit(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
