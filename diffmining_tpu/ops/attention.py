"""Attention kernels.

TPU-native replacement for xformers ``memory_efficient_attention`` which the
reference enables on every UNet (reference: diffmining/typicality/compute.py:71-72,
finetuning/base.py:178-191). Two interchangeable implementations behind one
signature:

  * ``sdpa_xla``   — einsum softmax; XLA fuses this well and it is the
                     baseline/fallback (and the only path on CPU tests).
  * ``sdpa_pallas``— Pallas flash-attention kernel for TPU (ops/flash_attention.py).

``sdpa`` dispatches on the default backend, settable globally; UNet sequence
lengths here are ≤4096 (64×64 latents) for self-attention and 77 for
cross-attention.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = os.environ.get("DIFFMINING_ATTN_BACKEND", "auto")
if _DEFAULT_BACKEND not in ("xla", "pallas", "auto"):
    raise ValueError(
        f"DIFFMINING_ATTN_BACKEND={_DEFAULT_BACKEND!r}: expected xla|pallas|auto"
    )


def set_attention_backend(name: str) -> None:
    """Set the process-wide attention backend: 'xla' | 'pallas' | 'auto'."""
    global _DEFAULT_BACKEND
    assert name in ("xla", "pallas", "auto"), name
    _DEFAULT_BACKEND = name


def get_attention_backend() -> str:
    """Resolved backend; "auto" applies a measured batch-size crossover in
    sdpa() (v5e, H8 L4096 D40 bf16): our Pallas flash wins at small batch
    (9.35 vs 13.11 ms at B=8 — XLA's per-call overhead and logits
    materialization dominate there) while XLA's fusion wins at B≥16
    (14.8 vs 19.9 ms). jax's builtin pallas flash measured 33.8 ms;
    jax.nn.dot_product_attention ties XLA."""
    return _DEFAULT_BACKEND


# measured (v5e, blocks 1024): pallas flash beats XLA for long-sequence
# self-attention at every batch tested — 6.37 vs 13.11 ms (B8), 11.40 vs
# 14.8 ms (B16), 22.2 ms at B32


def sdpa_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Scaled dot-product attention.

    Shapes: q [B, H, Lq, D], k/v [B, H, Lk, D] -> [B, H, Lq, D].
    Softmax accumulates in fp32 regardless of input dtype (bf16 on TPU).
    """
    *_, d = q.shape
    scale = scale if scale is not None else 1.0 / (d**0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _auto_use_pallas(q_shape, k_shape, on_tpu: bool) -> bool:
    """The measured auto-dispatch gate (v5e, see BENCH_NOTES.md):

    * self-attention L >= 1024 (crossover with 1024-blocks, B16 bf16:
      L1024 D80 pallas 1.34 vs XLA 2.13 ms; L4096 D40 10.9 vs 11.0;
      L256 D160 XLA wins 0.62 vs 0.72);
    * head dim <= 160 — the UNet head dims (40/80/160) the kernel was
      tuned and measured at. The VAE mid-block attention is single-head
      D=512 (models/vae.py) and at that width the kernel's K/V + fp32
      accumulator blocks exceed the 16 MB scoped-VMEM limit — a COMPILE
      time failure the call-site try/except cannot catch (the pallas_call
      traces fine; the remote TPU compile then OOMs VMEM). XLA handles
      the wide single-head shape well; keep it there.
    """
    return (
        on_tpu
        and q_shape[2] >= 1024
        and q_shape[2] == k_shape[2]
        and q_shape[3] <= 160
    )


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    backend = get_attention_backend()
    use_pallas = backend == "pallas"
    if backend == "auto" and mask is None:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        use_pallas = _auto_use_pallas(q.shape, k.shape, on_tpu)
    if use_pallas and mask is None:
        try:
            from diffmining_tpu.ops.flash_attention import flash_attention, flash_attention_t

            if os.environ.get("DIFFMINING_ATTN_TLAYOUT", "1") != "0":
                # transposed-operand kernel: the q/k/v projections emit
                # sequence-on-lanes layouts, and these transposes fold into
                # XLA layout assignment (bitcasts) instead of the HBM
                # transpose-copies the default-layout kernel forces — see
                # flash_attention_t / BENCH_NOTES
                o_t = flash_attention_t(
                    q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2), scale
                )
                return o_t.transpose(0, 1, 3, 2)
            return flash_attention(q, k, v, scale=scale)
        except Exception:
            pass  # fall back to XLA (e.g. unsupported shape)
    return sdpa_xla(q, k, v, mask=mask, scale=scale)


def sdpa_cbl_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float | None = None,
) -> jax.Array:
    """Channel-major SDPA: q [H*D, B, Lq], k/v [H*D, B, Lk] -> [H*D, B, Lq].

    The einsum contracts the (head-split) channel dim directly, so the
    channel-major activations of the t-world transformer block (see
    models/unet.py SpatialTransformer) never transpose through HBM.
    Softmax accumulates fp32 as in sdpa_xla."""
    hd, b, lq = q.shape
    d = hd // heads
    scale = scale if scale is not None else 1.0 / (d**0.5)
    qh = q.reshape(heads, d, b, lq)
    kh = k.reshape(heads, d, b, k.shape[2])
    vh = v.reshape(heads, d, b, v.shape[2])
    logits = jnp.einsum("hdbq,hdbk->bhqk", qh, kh, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,hdbk->hdbq", weights, vh)
    return o.reshape(hd, b, lq)


def sdpa_cbl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float | None = None,
) -> jax.Array:
    """Channel-major sdpa with the same measured pallas/XLA auto-dispatch
    gate as sdpa() (self-attention L>=1024, head dim <=160, TPU)."""
    backend = get_attention_backend()
    use_pallas = backend == "pallas"
    hd, b, lq = q.shape
    if backend == "auto":
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        use_pallas = (
            on_tpu and lq >= 1024 and lq == k.shape[2] and hd // heads <= 160
        )
    if use_pallas:
        try:
            from diffmining_tpu.ops.flash_attention import flash_attention_cbl

            return flash_attention_cbl(q, k, v, heads, scale)
        except Exception:
            pass  # fall back to XLA (e.g. unsupported shape)
    return sdpa_cbl_xla(q, k, v, heads, scale=scale)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, L, H*D] -> [B, H, L, D]."""
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


@jax.jit
def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, L, D] -> [B, L, H*D]."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)
