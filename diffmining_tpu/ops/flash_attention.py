"""Pallas TPU flash-attention (forward + backward) for the UNet's attention.

TPU-native replacement for xformers memory_efficient_attention (reference
enables it on every UNet: typicality/compute.py:71-72, finetuning/
base.py:178-191). Shapes in SD-v1.5: self-attention Lq=Lk ∈ {64..4096},
cross-attention Lk=77, head_dim ∈ {40, 80, 160} — head_dim is zero-padded to
the 128-lane width and short key lengths are masked, so one kernel covers all
layers.

Forward is the standard online-softmax tiling (fp32 accumulators in VMEM,
one (batch·head) × q-block × k-block grid); under differentiation it also
emits the per-row logsumexp. Backward is two Pallas kernels (flash-attention
v2 style): a dq kernel gridded q-outer/k-inner and a dk/dv kernel gridded
k-outer/q-inner, both re-forming p = exp(logits − lse) from the residual
logsumexp so no [Lq, Lk] weight tensor ever materializes. A pure-JAX
q-chunked recompute backward remains as the non-TPU fallback
(DIFFMINING_FLASH_BWD=pallas|recompute|auto).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e): fold into the q scale, exp->exp2
LN2 = 0.6931471805599453
# DIFFMINING_FLASH_BF16_EXP was deleted in round 5: off-default since round 2,
# measured −3% at kernel level (BENCH_NOTES), and the round-4c one-shot default
# made it a silent no-op on single-k-block shapes. History: BENCH_NOTES round-2
# table + round-5 note.


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, acc_ref, *, kv_len, block_k, masked):
    # q arrives PRE-SCALED (scale folded into q outside the kernel: one
    # [L,D] multiply replaces a [bq,bk] multiply per block pair — the kernel
    # is VPU-bound in the softmax elementwise chain, so every per-logit op
    # counts). `masked` is static: self-attention at power-of-two L has no
    # key padding, and the iota+compare+select chain (3 VPU ops/logit) is
    # ~25% of the kernel's VPU work.
    #
    # The softmax denominator rides the PV matmul: v arrives with a ones
    # COLUMN appended on the head axis (caller), so column d of the
    # [bq, d+1] PV product is the row-sum of p and acc's alpha-rescale keeps
    # it correct across k blocks — the [bq, bk] VPU sum-reduce and the l
    # scratch are gone. Free on the MXU: the output pads to 128 lanes at
    # D=40/80/160 regardless (see _flash_kernel_t).
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d+1] (last column = ones)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if masked:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)

    m_prev = m_ref[...]  # [bq, 1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(logits - m_new)
    m_ref[...] = m_new
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, d+1]; column d accumulates l

    @pl.when(j == nj - 1)
    def _finish():
        acc = acc_ref[...]
        l_safe = jnp.maximum(acc[:, -1:], 1e-30)
        # reciprocal-then-multiply: one divide per ROW instead of per element
        # (VPU divides are multi-pass; the [bq, d] broadcast becomes muls)
        o_ref[0] = (acc[:, :-1] * (1.0 / l_safe)).astype(o_ref.dtype)
        # m is a base-2 logit; emit the NATURAL logsumexp for the backward
        lse_ref[0] = m_ref[...] * LN2 + jnp.log(l_safe)


def _pad_to(x, axis, m):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


import os

_BLOCK_Q = int(os.environ.get("DIFFMINING_FLASH_BLOCK_Q", "1024"))
_BLOCK_K = int(os.environ.get("DIFFMINING_FLASH_BLOCK_K", "1024"))
# no-max one-shot softmax when the whole key row is one k block (see
# _flash_kernel_t_1shot): "0" = off, "1" = long-L (lq>=4096) only,
# "all" = every single-k-block shape. Default "all" per the repeated
# in-context A/B (headline 141.12/141.09 vs long-L 140.24/139.97 vs off
# 137.67 passes/s; e2e 2,656 vs 2,644 vs 2,595 imgs/hr — BENCH_NOTES
# round-4c). The isolated L1024/L256 microbench regression does NOT
# reproduce in-context: those levels are a small share of pass time and
# the no-scratch kernel schedules better inside the full program.
_ONESHOT = os.environ.get("DIFFMINING_FLASH_ONESHOT", "all")


def _oneshot_auto(lq: int) -> bool:
    """Resolve the DIFFMINING_FLASH_ONESHOT tri-state for a query length —
    one definition shared by every forward so the gate can't drift between
    kernels (and so tests can pin each setting's routing directly)."""
    return _ONESHOT == "all" or (_ONESHOT == "1" and lq >= 4096)


# multi-k-block no-max kernel (_flash_kernel_t_nomax) on long-L self-attention
# when the key row does NOT fit one k block. "0" = off, "1" = lq>=4096
# (default). Default ON per round-5 stage B/D: at L=16384 dropping the online-
# softmax chain wins the microbench (50.20 vs 53.12 ms, −5.5%) AND e2e 1024px
# native-res (359.1 vs 349.6 imgs/hr, +2.7% — BENCH_NOTES round-5 stage D).
# It only engages where the key row spans several k blocks — at the default
# block choice L=4096 is single-block and routes to the one-shot kernel first,
# so the measured L=4096 forced-multi-block LOSS (stage B) is unreachable here.
_NOMAX = os.environ.get("DIFFMINING_FLASH_NOMAX", "1")


def _nomax_auto(lq: int, lk: int) -> bool:
    return _NOMAX == "1" and lq >= 4096 and lq == lk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale=None):
    """q [B,H,Lq,D], k/v [B,H,Lk,D] -> [B,H,Lq,D]. Non-causal, no mask."""
    return _flash_forward(q, k, v, scale)


def _flash_forward(q, k, v, scale=None, block_q=None, block_k=None, return_lse=False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else 1.0 / (d**0.5)

    block_q = min(block_q or _BLOCK_Q, max(128, lq))
    block_k = min(block_k or _BLOCK_K, max(128, lk))

    # fold the softmax scale into q (see kernel comment), in log2 space:
    # the kernel computes exp2 (VPU-native; the exp(x)=exp2(x*log2e) multiply
    # is free here). The head dim is NOT padded to 128 in HBM — Mosaic
    # tile-pads narrow minor dims in VMEM, and materializing D→128 in HBM
    # tripled q/k/v/o traffic at D=40 (measured: 11.7→10.6 ms at L4096).
    qs = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(b * h, lq, d)
    qq = _pad_to(qs, 1, block_q)
    kk = _pad_to(k.reshape(b * h, lk, d), 1, block_k)
    # ones column on the head axis: PV's column d accumulates the softmax
    # denominator on the MXU (see _flash_kernel)
    vv = _pad_to(v.reshape(b * h, lk, d), 1, block_k)
    vv = jnp.concatenate([vv, jnp.ones((*vv.shape[:2], 1), vv.dtype)], axis=2)
    bh, lq_p, dp = qq.shape
    lk_p = kk.shape[1]

    grid = (bh, lq_p // block_q, lk_p // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=lk, block_k=block_k, masked=lk != lk_p),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_p, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, lq_p, 1), jnp.float32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda bb, i, j: (bb, i, 0)),
                pl.BlockSpec((1, block_k, dp), lambda bb, i, j: (bb, j, 0)),
                pl.BlockSpec((1, block_k, dp + 1), lambda bb, i, j: (bb, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dp), lambda bb, i, j: (bb, i, 0)),
                pl.BlockSpec((1, block_q, 1), lambda bb, i, j: (bb, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),  # m
                pltpu.VMEM((block_q, dp + 1), jnp.float32),  # acc (+l column)
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qq, kk, vv)
    o = out[:, :lq, :d].reshape(b, h, lq, d)
    if return_lse:
        return o, lse[:, :lq, 0].reshape(b, h, lq)
    return o


def _flash_kernel_t(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *, kv_len, block_k, masked, k_axis=2):
    # Transposed-operand variant: refs are [1, D, block] with the SEQUENCE on
    # the lane (minor) axis — the layout XLA's qkv projections naturally emit
    # (the fused dot produces L-in-lanes; feeding the default-layout kernel
    # costs a ~0.27 ms HBM transpose-copy per operand per layer, profiled in
    # BENCH_NOTES). Same online softmax; logits contract dim 0 of both
    # operands, AV contracts the k axis of both.
    #
    # The softmax denominator rides the PV matmul: v arrives with a ones row
    # appended on the head axis (caller), so column d of the [bq, d+1] PV
    # product IS the row-sum of p, and the online alpha-rescale of acc keeps
    # it correct across k blocks — no VPU row-sum, no separate l scratch.
    # At D=40/80/160 the extra lane is free (the MXU pads the output to 128
    # lanes regardless); the kernel is VPU-bound in the softmax chain, so
    # dropping the [bq, bk] sum-reduce is a real win (~1 of the ~5 VPU ops
    # per logit).
    j = pl.program_id(k_axis)
    nj = pl.num_programs(k_axis)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qt = q_ref[0]  # [d, bq]
    kt = k_ref[0]  # [d, bk]
    vt = v_ref[0]  # [d+1, bk] (last row = ones)
    logits = jax.lax.dot_general(
        qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if masked:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)

    m_prev = m_ref[...]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(logits - m_new)
    m_ref[...] = m_new
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(vt.dtype), vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, d+1]; column d accumulates l

    @pl.when(j == nj - 1)
    def _finish():
        acc = acc_ref[...]
        l_safe = jnp.maximum(acc[:, -1:], 1e-30)
        o_ref[0] = (acc[:, :-1] * (1.0 / l_safe)).T.astype(o_ref.dtype)  # [d, bq]


def _flash_kernel_t_nomax(q_ref, k_ref, v_ref, o_ref, acc_ref, *, kv_len, block_k, masked, k_axis=2):
    # Multi-k-block no-max kernel: the one-shot envelope argument (see
    # _flash_kernel_t_1shot) does not require the whole key row in ONE block —
    # exp2 without the max shift is exact after the ones-row denominator
    # division whatever the block structure, so the online-softmax machinery
    # (running max, subtract, alpha rescale, m scratch) can be dropped while
    # keeping k blocks small: acc += p @ v is the entire cross-block state.
    # Two reasons to want small k blocks with no max: (a) L=16384 exceeds the
    # one-shot kernel's VMEM at full-row k; (b) sub-row blocks let Mosaic
    # pipeline the VPU exp2 of block j against the MXU logits dot of block
    # j+1 (the "softmax-chain scheduling" lever, BENCH_NOTES round-5).
    # Same fp32 envelope as the one-shot kernel.
    j = pl.program_id(k_axis)
    nj = pl.num_programs(k_axis)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qt = q_ref[0]  # [d, bq]
    kt = k_ref[0]  # [d, bk]
    vt = v_ref[0]  # [d+1, bk] (last row = ones)
    logits = jax.lax.dot_general(
        qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if masked:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    p = jnp.exp2(logits)
    acc_ref[...] += jax.lax.dot_general(
        p.astype(vt.dtype), vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, d+1]; column d accumulates the denominator

    @pl.when(j == nj - 1)
    def _finish():
        acc = acc_ref[...]
        l_safe = jnp.maximum(acc[:, -1:], 1e-30)
        o_ref[0] = (acc[:, :-1] * (1.0 / l_safe)).T.astype(o_ref.dtype)


def _flash_kernel_t_1shot(q_ref, k_ref, v_ref, o_ref, *, kv_len, masked):
    # Single-k-block specialization: the FULL key row is resident in VMEM
    # (the >=4096 block switch below picks full-row k blocks anyway), so the
    # online-softmax machinery — running max, subtract, alpha rescale, m/acc
    # scratch — is pure VPU overhead. exp2 WITHOUT the max shift is
    # mathematically identical after the ones-column denominator division,
    # within an fp32 envelope the online kernel does not have:
    #   * overflow: the fp32 PV accumulator sums p·v over the whole key row,
    #     so the requirement is max logit2 < 127 − log2(Lk·max|v|) — natural
    #     logit < ~76 at Lk=16384 with O(8) v, not the per-element 88;
    #   * underflow: a row whose logits are ALL below logit2 −126 (natural
    #     −87) has p = 0 everywhere and outputs zeros instead of a softmax.
    # UNet attention logits are O(10) (GroupNorm'd activations through
    # bounded projections), an order of magnitude inside both edges;
    # fidelity is pinned at adversarial logit scale AND at the production
    # Lk=4096/16384 key counts near the envelope edge in
    # tests/test_flash_attention.py. Masked pad columns hit
    # exp2(NEG_INF) = 0 exactly, so masking needs no max either.
    # Saves ~2 of the ~4 VPU passes per logit in a VPU-bound kernel.
    qt = q_ref[0]  # [d, bq]
    kt = k_ref[0]  # [d, bk]
    vt = v_ref[0]  # [d+1, bk] (last row = ones)
    logits = jax.lax.dot_general(
        qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    p = jnp.exp2(logits)
    pv = jax.lax.dot_general(
        p.astype(vt.dtype), vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, d+1]; column d is the softmax denominator
    l_safe = jnp.maximum(pv[:, -1:], 1e-30)
    o_ref[0] = (pv[:, :-1] * (1.0 / l_safe)).T.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_t(qt, kt, vt, scale=None):
    """Flash attention on transposed operands (sequence on lanes).

    qt [B,H,D,Lq], kt/vt [B,H,D,Lk] -> o_t [B,H,D,Lq]. The sequence axis sits
    on lanes end to end, so the surrounding projections hand their natural
    output layout straight to the kernel — XLA folds the caller's transposes
    into layout assignment instead of HBM copies (measured: the default-layout
    kernel costs ~0.27 ms of transpose-copy per operand per level-0 layer, and
    the transposed kernel is additionally faster in isolation: 9.19 vs
    10.32 ms at B16 H8 L4096 D40 — BENCH_NOTES). Under differentiation the
    fwd/bwd rules reroute through the standard-layout kernels.
    """
    return _flash_forward_t(qt, kt, vt, scale)


def _flash_forward_t(qt, kt, vt, scale=None, block_q=None, block_k=None, oneshot=None, nomax=None):
    # oneshot: None = auto (env gate + long-L regime); True/False forces the
    # single-k-block no-max kernel on/off (tests exercise it at small shapes).
    # nomax: same for the MULTI-k-block no-max kernel (engages only when the
    # key row spans several k blocks; the one-shot kernel wins otherwise).
    b, h, d, lq = qt.shape
    lk = kt.shape[3]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    if (
        block_q is None and block_k is None
        and "DIFFMINING_FLASH_BLOCK_Q" not in os.environ
        and "DIFFMINING_FLASH_BLOCK_K" not in os.environ
        and lq >= 4096 and lq == lk
    ):
        # measured (v5e, B16 H8 L4096 D40): full-row k blocks drop the online-
        # softmax rescale entirely — 8.6 ms at 512x4096 vs 9.5 at 1024x1024;
        # k capped at 4096 so L=16384 stays within VMEM (BENCH_NOTES)
        block_q, block_k = 512, 4096
    block_q = min(block_q or _BLOCK_Q, max(128, lq))
    block_k = min(block_k or _BLOCK_K, max(128, lk))

    qs = (qt * jnp.asarray(scale * LOG2E, qt.dtype)).reshape(b * h, d, lq)
    qq = _pad_to(qs, 2, block_q)
    kk = _pad_to(kt.reshape(b * h, d, lk), 2, block_k)
    # ones row on the head axis: the PV matmul's column d accumulates the
    # softmax denominator on the MXU (see _flash_kernel_t). The pad is one
    # extra sublane on a dim already tile-padded in VMEM, and XLA fuses the
    # concat into the v producer.
    vv = _pad_to(vt.reshape(b * h, d, lk), 2, block_k)
    vv = jnp.concatenate([vv, jnp.ones((b * h, 1, vv.shape[2]), vv.dtype)], axis=1)
    bh, dp, lq_p = qq.shape
    lk_p = kk.shape[2]

    # one-shot regime choice is measured: −3.9% at L4096 (8.13 -> 7.81 ms)
    # and wins in-context at every level despite an isolated L1024/L256
    # microbench regression (BENCH_NOTES round-4c)
    if oneshot is None:
        oneshot = _oneshot_auto(lq)
    if lk_p == block_k and oneshot:
        # single k block: the no-max specialization (see _flash_kernel_t_1shot)
        out = pl.pallas_call(
            functools.partial(_flash_kernel_t_1shot, kv_len=lk, masked=lk != lk_p),
            out_shape=jax.ShapeDtypeStruct((bh, dp, lq_p), qt.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(bh, lq_p // block_q),
                in_specs=[
                    pl.BlockSpec((1, dp, block_q), lambda bb, i: (bb, 0, i)),
                    pl.BlockSpec((1, dp, block_k), lambda bb, i: (bb, 0, 0)),
                    pl.BlockSpec((1, dp + 1, block_k), lambda bb, i: (bb, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, dp, block_q), lambda bb, i: (bb, 0, i)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(qq, kk, vv)
        return out[:, :, :lq].reshape(b, h, d, lq)

    grid = (bh, lq_p // block_q, lk_p // block_k)
    if nomax is None:
        nomax = _nomax_auto(lq, lk)
    if nomax:
        kernel = functools.partial(
            _flash_kernel_t_nomax, kv_len=lk, block_k=block_k, masked=lk != lk_p
        )
        scratch = [pltpu.VMEM((block_q, dp + 1), jnp.float32)]  # acc (+l column)
    else:
        kernel = functools.partial(
            _flash_kernel_t, kv_len=lk, block_k=block_k, masked=lk != lk_p
        )
        scratch = [
            pltpu.VMEM((block_q, 1), jnp.float32),  # m
            pltpu.VMEM((block_q, dp + 1), jnp.float32),  # acc (+l column)
        ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, dp, lq_p), qt.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, dp, block_q), lambda bb, i, j: (bb, 0, i)),
                pl.BlockSpec((1, dp, block_k), lambda bb, i, j: (bb, 0, j)),
                pl.BlockSpec((1, dp + 1, block_k), lambda bb, i, j: (bb, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, dp, block_q), lambda bb, i, j: (bb, 0, i)),
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qq, kk, vv)
    return out[:, :, :lq].reshape(b, h, d, lq)


def _fwd_t(qt, kt, vt, scale):
    q, k, v = (a.transpose(0, 1, 3, 2) for a in (qt, kt, vt))
    o, lse = _flash_forward(q, k, v, scale, return_lse=True)
    return o.transpose(0, 1, 3, 2), (q, k, v, o, lse)


def _bwd_t(scale, res, gt):
    dq, dk, dv = _bwd_rule(scale, res, gt.transpose(0, 1, 3, 2))
    return tuple(a.transpose(0, 1, 3, 2) for a in (dq, dk, dv))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_cbl(qc, kc, vc, heads, scale=None):
    """Flash attention on channel-major operands: qc [H*D, B, Lq],
    kc/vc [H*D, B, Lk] -> o [H*D, B, Lq].

    This is the shape a transposed projection dot emits NATIVELY:
    dot_general(W [C, H*D], x [C, B, L], contracting C) -> [H*D, B, L], so
    the whole q/k/v/o path keeps default layouts end to end — no {1,2,0}
    re-materialization of the transformer input and no per-operand HBM
    transpose (the round-4d HLO attribution put ~630 MB/dispatch of copies
    on exactly this boundary). Internally a free bitcast to [H, D, B·L]
    feeds the same online-softmax kernels as flash_attention_t with
    per-image block index maps. Under differentiation fwd/bwd reroute
    through the standard-layout kernels."""
    return _flash_forward_cbl(qc, kc, vc, heads, scale)


def _flash_forward_cbl(qc, kc, vc, heads, scale=None, block_q=None, block_k=None, oneshot=None):
    hd, b, lq = qc.shape
    lk = kc.shape[2]
    d = hd // heads
    scale = scale if scale is not None else 1.0 / (d**0.5)
    if (
        block_q is None and block_k is None
        and "DIFFMINING_FLASH_BLOCK_Q" not in os.environ
        and "DIFFMINING_FLASH_BLOCK_K" not in os.environ
        and lq >= 4096 and lq == lk
    ):
        block_q, block_k = 512, 4096  # same policy as _flash_forward_t
    block_q = min(block_q or _BLOCK_Q, max(128, lq))
    block_k = min(block_k or _BLOCK_K, max(128, lk))

    # per-image pad on the L dim BEFORE merging (B, L): each image's segment
    # must be block-aligned individually (no pad op at the product shapes —
    # 4096 % 512 == 0 etc.)
    qs = (qc * jnp.asarray(scale * LOG2E, qc.dtype)).reshape(heads, d, b, lq)
    qq = _pad_to(qs, 3, block_q)
    kk = _pad_to(kc.reshape(heads, d, b, lk), 3, block_k)
    vv = _pad_to(vc.reshape(heads, d, b, lk), 3, block_k)
    vv = jnp.concatenate([vv, jnp.ones((heads, 1, b, vv.shape[3]), vv.dtype)], axis=1)
    lq_p, lk_p = qq.shape[3], kk.shape[3]
    nqb, nkb = lq_p // block_q, lk_p // block_k
    # merge (B, L): adjacent majors, a free bitcast in the default layout
    qq = qq.reshape(heads, d, b * lq_p)
    kk = kk.reshape(heads, d, b * lk_p)
    vv = vv.reshape(heads, d + 1, b * lk_p)

    if oneshot is None:
        oneshot = _oneshot_auto(lq)
    if nkb == 1 and oneshot:
        out = pl.pallas_call(
            functools.partial(_flash_kernel_t_1shot, kv_len=lk, masked=lk != lk_p),
            out_shape=jax.ShapeDtypeStruct((heads, d, b * lq_p), qc.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(b, heads, nqb),
                in_specs=[
                    pl.BlockSpec((1, d, block_q), lambda bb, hh, i, n=nqb: (hh, 0, bb * n + i)),
                    pl.BlockSpec((1, d, block_k), lambda bb, hh, i: (hh, 0, bb)),
                    pl.BlockSpec((1, d + 1, block_k), lambda bb, hh, i: (hh, 0, bb)),
                ],
                out_specs=pl.BlockSpec((1, d, block_q), lambda bb, hh, i, n=nqb: (hh, 0, bb * n + i)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
        )(qq, kk, vv)
    else:
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel_t, kv_len=lk, block_k=block_k, masked=lk != lk_p, k_axis=3
            ),
            out_shape=jax.ShapeDtypeStruct((heads, d, b * lq_p), qc.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(b, heads, nqb, nkb),
                in_specs=[
                    pl.BlockSpec((1, d, block_q), lambda bb, hh, i, j, n=nqb: (hh, 0, bb * n + i)),
                    pl.BlockSpec((1, d, block_k), lambda bb, hh, i, j, n=nkb: (hh, 0, bb * n + j)),
                    pl.BlockSpec((1, d + 1, block_k), lambda bb, hh, i, j, n=nkb: (hh, 0, bb * n + j)),
                ],
                out_specs=pl.BlockSpec((1, d, block_q), lambda bb, hh, i, j, n=nqb: (hh, 0, bb * n + i)),
                scratch_shapes=[
                    pltpu.VMEM((block_q, 1), jnp.float32),  # m
                    pltpu.VMEM((block_q, d + 1), jnp.float32),  # acc (+l column)
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(qq, kk, vv)
    out = out.reshape(heads, d, b, lq_p)[:, :, :, :lq]
    return out.reshape(hd, b, lq)


def _fwd_cbl(qc, kc, vc, heads, scale):
    b, lq = qc.shape[1], qc.shape[2]
    d = qc.shape[0] // heads

    def to_bhld(a):
        return a.reshape(heads, d, b, a.shape[2]).transpose(2, 0, 3, 1)

    q, k, v = to_bhld(qc), to_bhld(kc), to_bhld(vc)
    o, lse = _flash_forward(q, k, v, scale, return_lse=True)
    o_c = o.transpose(1, 3, 0, 2).reshape(heads * d, b, lq)
    return o_c, (q, k, v, o, lse)


def _bwd_cbl(heads, scale, res, gc):
    b, lq = gc.shape[1], gc.shape[2]
    d = gc.shape[0] // heads
    g = gc.reshape(heads, d, b, lq).transpose(2, 0, 3, 1)
    dq, dk, dv = _bwd_rule(scale, res, g)
    return tuple(
        a.transpose(1, 3, 0, 2).reshape(heads * d, a.shape[0], a.shape[2])
        for a in (dq, dk, dv)
    )


def _fwd(q, k, v, scale):
    o, lse = _flash_forward(q, k, v, scale, return_lse=True)
    return o, (q, k, v, o, lse)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dq_ref, acc_ref, *, scale, kv_len, block_k, masked):
    # q arrives pre-scaled (matching the forward's lse); the remaining single
    # `scale` converts d(loss)/d(q·scale) to d(loss)/dq once per q block.
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # [bq, 1]
    delta = dl_ref[0]  # [bq, 1]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    p = jnp.exp2(logits - lse)  # q pre-scaled by scale*log2e; lse in base 2
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(k.dtype)
    acc_ref[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _finish():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, kv_len, block_k, masked):
    # q pre-scaled by scale*log2e: dk = ds^T @ (q·scale), so the accumulated
    # value carries a spurious log2e — removed at _finish via *LN2.
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # [bq, 1]
    delta = dl_ref[0]  # [bq, 1]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if masked:
        col = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    p = jnp.exp2(logits - lse)  # q pre-scaled by scale*log2e; lse in base 2
    # dv += p^T @ do   (contract the q dimension)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == ni - 1)
    def _finish():
        # q arrived scaled by scale*log2e but dk = ds^T @ (q*scale): undo
        # the log2e factor once per k block
        dk_ref[0] = (dk_acc[...] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# measured (v5e, B8 H8 L4096 D40): 1024x1024 = 18.3 ms fwd+bwd vs 21.3 at
# 512x512 and 45.7 for XLA sdpa grad — see BENCH_NOTES.md
_BWD_BLOCK_Q = int(os.environ.get("DIFFMINING_FLASH_BWD_BLOCK_Q", "1024"))
_BWD_BLOCK_K = int(os.environ.get("DIFFMINING_FLASH_BWD_BLOCK_K", "1024"))


def _bwd_pallas(scale, res, g, block_q=None, block_k=None):
    """Flash-attention backward as two Pallas kernels re-forming the softmax
    from the forward's logsumexp (no [Lq, Lk] weight tensor in HBM)."""
    q, k, v, o, lse = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    s = scale if scale is not None else 1.0 / (d**0.5)
    block_q = min(block_q or _BWD_BLOCK_Q, max(128, lq))
    block_k = min(block_k or _BWD_BLOCK_K, max(128, lk))

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [b,h,lq]

    # same log2-pre-scaled q as the forward; lse converted to base 2 so
    # the kernels re-form p with exp2. Head dim stays native (see forward).
    qs_ = (q * jnp.asarray(s * LOG2E, q.dtype)).reshape(b * h, lq, d)
    qq = _pad_to(qs_, 1, block_q)
    gg = _pad_to(g.reshape(b * h, lq, d), 1, block_q)
    kk = _pad_to(k.reshape(b * h, lk, d), 1, block_k)
    vv = _pad_to(v.reshape(b * h, lk, d), 1, block_k)
    ll = _pad_to((lse * LOG2E).reshape(b * h, lq, 1), 1, block_q)
    dd = _pad_to(delta.reshape(b * h, lq, 1), 1, block_q)
    bh, lq_p, dp = qq.shape
    lk_p = kk.shape[1]
    n_q, n_k = lq_p // block_q, lk_p // block_k

    row_spec = lambda ix: pl.BlockSpec((1, block_q, dp), ix)
    col_spec = lambda ix: pl.BlockSpec((1, block_k, dp), ix)
    one_spec = lambda ix: pl.BlockSpec((1, block_q, 1), ix)

    # dq: q-outer, k-inner
    by_i = lambda bb, i, j: (bb, i, 0)
    by_j = lambda bb, i, j: (bb, j, 0)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=s, kv_len=lk, block_k=block_k, masked=lk != lk_p),
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, dp), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bh, n_q, n_k),
            in_specs=[row_spec(by_i), col_spec(by_j), col_spec(by_j), row_spec(by_i), one_spec(by_i), one_spec(by_i)],
            out_specs=row_spec(by_i),
            scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qq, kk, vv, gg, ll, dd)

    # dk/dv: k-outer, q-inner (grid index 1 is the k block, index 2 the q block)
    kv_by_j = lambda bb, j, i: (bb, j, 0)
    q_by_i = lambda bb, j, i: (bb, i, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, kv_len=lk, block_k=block_k, masked=lk != lk_p),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk_p, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_p, dp), v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bh, n_k, n_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dp), q_by_i),
                pl.BlockSpec((1, block_k, dp), kv_by_j),
                pl.BlockSpec((1, block_k, dp), kv_by_j),
                pl.BlockSpec((1, block_q, dp), q_by_i),
                pl.BlockSpec((1, block_q, 1), q_by_i),
                pl.BlockSpec((1, block_q, 1), q_by_i),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, dp), kv_by_j),
                pl.BlockSpec((1, block_k, dp), kv_by_j),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, dp), jnp.float32),
                pltpu.VMEM((block_k, dp), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qq, kk, vv, gg, ll, dd)

    dq = dq[:, :lq, :d].reshape(b, h, lq, d)
    dk = dk[:, :lk, :d].reshape(b, h, lk, d)
    dv = dv[:, :lk, :d].reshape(b, h, lk, d)
    return dq, dk, dv


def _bwd(scale, res, g, chunk: int = 512):
    """Recompute backward, chunked over q blocks so only [*, chunk, Lk]
    attention weights materialize at a time (the naive backward's full fp32
    weight tensor is 4.3 GB at 512px/B8 and OOMs at higher res). Training's
    hot path is the UNet fwd+bwd convs; this keeps memory flat instead of
    hand-writing a Pallas backward (tracked for a later round)."""
    q, k, v = res
    d = q.shape[-1]
    s = scale if scale is not None else 1.0 / (d**0.5)
    lq = q.shape[2]
    chunk = min(chunk, lq)
    pad = (-lq) % chunk
    if pad:
        q_p = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        g_p = jnp.pad(g, ((0, 0), (0, 0), (0, pad), (0, 0)))
    else:
        q_p, g_p = q, g
    n_chunks = q_p.shape[2] // chunk
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)

    def step(carry, qc_gc):
        dk_acc, dv_acc = carry
        q_c, g_c = qc_gc  # [B,H,chunk,D]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q_c, k, preferred_element_type=jnp.float32) * s
        w = jax.nn.softmax(logits, axis=-1)
        g32 = g_c.astype(jnp.float32)
        dw = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", w, g32)
        dlog = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        dq_c = jnp.einsum("bhqk,bhkd->bhqd", dlog, k32) * s
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", dlog, q_c.astype(jnp.float32)) * s
        return (dk_acc, dv_acc), dq_c

    # scan over q chunks: [n, B, H, chunk, D]
    qs = q_p.reshape(*q.shape[:2], n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
    gs = g_p.reshape(*q.shape[:2], n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
    zeros = jnp.zeros(k.shape, jnp.float32)
    (dk, dv), dqs = jax.lax.scan(step, (zeros, zeros), (qs, gs))
    dq = dqs.transpose(1, 2, 0, 3, 4).reshape(q_p.shape)[:, :, :lq]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd_rule(scale, res, g):
    """auto: Pallas backward on TPU, chunked-recompute JAX backward elsewhere
    (the Pallas kernels also run under pltpu.force_tpu_interpret_mode with
    DIFFMINING_FLASH_BWD=pallas, which is how tests check gradient parity)."""
    impl = os.environ.get("DIFFMINING_FLASH_BWD", "auto")
    if impl not in ("auto", "pallas", "recompute"):
        raise ValueError(f"DIFFMINING_FLASH_BWD={impl!r}: expected auto|pallas|recompute")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "recompute"
    q, k, v, o, lse = res
    if impl == "pallas":
        return _bwd_pallas(scale, res, g)
    return _bwd(scale, (q, k, v), g)


flash_attention.defvjp(_fwd, _bwd_rule)
flash_attention_t.defvjp(_fwd_t, _bwd_t)
flash_attention_cbl.defvjp(_fwd_cbl, _bwd_cbl)
