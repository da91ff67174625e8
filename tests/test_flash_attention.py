"""Flash-attention kernel correctness vs the XLA reference (interpreter mode
on CPU; the same kernel compiles on TPU — exercised by bench.py)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffmining_tpu.ops.attention import sdpa_xla
from diffmining_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (1, 2, 128, 128, 40),   # self-attn, head_dim 40 (pad to 128)
        (1, 2, 256, 77, 80),    # cross-attn over 77 text tokens (masked pad)
        (2, 1, 130, 130, 64),   # non-multiple seq length
    ],
)
def test_flash_matches_xla(b, h, lq, lk, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, lq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    want = np.asarray(sdpa_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_gradient_matches_xla():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 128, 32), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 128, 32), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, 128, 32), jnp.float32)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (1, 2, 256, 256, 40),   # self-attn shape, head pad 40->128
        (1, 1, 256, 77, 64),    # cross-attn, masked kv padding
        (2, 1, 130, 130, 32),   # non-multiple seq length
    ],
)
def test_pallas_backward_matches_xla(b, h, lq, lk, d, monkeypatch):
    """The two-kernel Pallas backward (dq + dk/dv from the saved logsumexp)
    must reproduce XLA's softmax-attention gradients."""
    monkeypatch.setenv("DIFFMINING_FLASH_BWD", "pallas")
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, h, lq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3)


def test_forward_lse_matches_xla():
    from diffmining_tpu.ops.flash_attention import _flash_forward

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 2, 130, 40), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 77, 40), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 77, 40), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        _, lse = _flash_forward(q, k, v, return_lse=True)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(40.0)
    want = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_chunked_backward_matches_unchunked():
    """The q-chunked backward must equal the full-materialization gradients
    for non-divisible sequence lengths too."""
    from diffmining_tpu.ops.flash_attention import _bwd

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 130, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 96, 16), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 96, 16), jnp.float32)
    g = jnp.asarray(rng.randn(1, 2, 130, 16), jnp.float32)
    small = _bwd(None, (q, k, v), g, chunk=32)   # 130 -> 5 chunks with padding
    full = _bwd(None, (q, k, v), g, chunk=130)   # single chunk
    for a, b in zip(small, full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (1, 2, 128, 128, 40),
        (1, 2, 256, 77, 80),   # masked key padding
        (2, 1, 130, 130, 64),  # non-multiple seq length
    ],
)
def test_flash_transposed_matches_standard(b, h, lq, lk, d):
    """flash_attention_t (sequence-on-lanes operands, the TPU inference
    layout) must equal the standard-layout kernel bit-for-bit — same blocks,
    same online softmax, only the dot operand orientation differs."""
    from diffmining_tpu.ops.flash_attention import flash_attention_t

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, h, lq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(flash_attention(q, k, v))
        got = np.asarray(
            flash_attention_t(
                q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2)
            ).transpose(0, 1, 3, 2)
        )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_flash_transposed_gradient():
    """The transposed wrapper's custom VJP reroutes through the standard
    kernels; gradients must match XLA sdpa."""
    from diffmining_tpu.ops.flash_attention import flash_attention_t

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 128, 40), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 128, 40), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 128, 40), jnp.float32)

    def loss_t(q, k, v):
        o = flash_attention_t(
            q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2)
        )
        return jnp.sum(jnp.sin(o.transpose(0, 1, 3, 2)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(sdpa_xla(q, k, v)))

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "b,h,lq,lk,d,block_q,block_k,oneshot",
    [
        (2, 2, 256, 256, 8, 128, 128, False),   # multi-k-block online path
        (2, 2, 256, 256, 8, 128, 256, True),    # one-shot single-k-block
        (2, 2, 256, 200, 8, 128, 256, True),    # per-image masked key pad
        (2, 2, 250, 200, 8, 128, 128, False),   # q AND k per-image pads
    ],
)
def test_flash_cbl_matches_xla(b, h, lq, lk, d, block_q, block_k, oneshot):
    """flash_attention_cbl (channel-major [H*D, B, L] operands — the t-world
    transformer block's native shape, models/unet.py) vs the channel-major
    XLA reference, including the per-image L padding the merged (B, L) dim
    requires."""
    from diffmining_tpu.ops.attention import sdpa_cbl_xla
    from diffmining_tpu.ops.flash_attention import _flash_forward_cbl

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(h * d, b, lq), jnp.float32)
    k = jnp.asarray(rng.randn(h * d, b, lk), jnp.float32)
    v = jnp.asarray(rng.randn(h * d, b, lk), jnp.float32)
    want = np.asarray(sdpa_cbl_xla(q, k, v, h))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            _flash_forward_cbl(q, k, v, h, block_q=block_q, block_k=block_k, oneshot=oneshot)
        )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_cbl_gradient():
    """flash_attention_cbl's custom VJP reroutes through the standard
    kernels; gradients must match the channel-major XLA reference."""
    from diffmining_tpu.ops.attention import sdpa_cbl_xla
    from diffmining_tpu.ops.flash_attention import flash_attention_cbl

    rng = np.random.RandomState(4)
    h, d, b, l = 2, 8, 2, 256
    q, k, v = (jnp.asarray(rng.randn(h * d, b, l), jnp.float32) for _ in range(3))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention_cbl(q, k, v, h, None)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(sdpa_cbl_xla(q, k, v, h)))

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "lq,lk,block_q,block_k,logit_std",
    [
        # production key counts near the documented fp32 envelope edge
        # (natural logit < 127·ln2 − ln(Lk·max|v|) ≈ 76 at Lk=16384): q rows
        # are unit-normalized so per-row logits are EXACTLY N(0, std²) — the
        # max over Lk keys lands ~4.5σ ≈ 68, just inside the edge, an order
        # of magnitude beyond the O(10) product logits
        (128, 4096, 128, 4096, 15.0),
        (128, 16384, 128, 16384, 15.0),
    ],
)
def test_oneshot_envelope_edge(lq, lk, block_q, block_k, logit_std):
    """The no-max one-shot kernel's fp32 safety envelope at the PRODUCTION
    key counts (L=4096 512px, L=16384 1024px native-res): the overflow bound
    is on the PV-accumulator row-sum, not the per-element exp2 —
    flash_attention.py:_flash_kernel_t_1shot docs the math."""
    import diffmining_tpu.ops.flash_attention as fa

    rng = np.random.RandomState(11)
    d = 8
    qn = rng.randn(1, 1, d, lq)
    qn = qn / np.linalg.norm(qn, axis=2, keepdims=True)  # unit q rows:
    # logits = std·(u·k) with u·k ~ N(0,1) exactly — no heavy per-row tails
    q = jnp.asarray(qn * logit_std * np.sqrt(d), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, d, lk), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, d, lk), jnp.float32)
    want = np.asarray(
        sdpa_xla(*(a.transpose(0, 1, 3, 2) for a in (q, k, v)))
    ).transpose(0, 1, 3, 2)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fa._flash_forward_t(q, k, v, block_q=block_q, block_k=block_k, oneshot=True)
        )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "b,h,lq,lk,d,block_q,block_k,logit_scale",
    [
        (1, 2, 512, 512, 8, 128, 128, 1.0),   # 4 k blocks, no pad
        (1, 1, 512, 300, 8, 128, 128, 1.0),   # masked key pad in the LAST block
        (2, 1, 260, 520, 16, 128, 128, 1.0),  # q pad + k multi-block
        (1, 1, 512, 512, 8, 128, 128, 12.0),  # adversarial logit magnitude
    ],
)
def test_nomax_multiblock_matches_xla(b, h, lq, lk, d, block_q, block_k, logit_scale):
    """_flash_kernel_t_nomax: exp2 WITHOUT the max shift across MULTIPLE
    k blocks — acc += p@v is the only cross-block state, the denominator
    division at the end makes it an exact softmax inside the one-shot
    envelope. (The round-5 'softmax-chain scheduling' lever and the L=16384
    middle ground above the one-shot kernel's VMEM cap.)"""
    import diffmining_tpu.ops.flash_attention as fa

    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(b, h, lq, d) * logit_scale, jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    want = np.asarray(sdpa_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        o_t = fa._flash_forward_t(
            q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2),
            block_q=block_q, block_k=block_k, oneshot=False, nomax=True,
        )
    got = np.asarray(o_t.transpose(0, 1, 3, 2))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_nomax_env_gate_routes(monkeypatch):
    """DIFFMINING_FLASH_NOMAX=1 routes long-L multi-k-block shapes to the
    no-max kernel; default keeps the online-softmax kernel (flag-engagement
    matrix discipline)."""
    import diffmining_tpu.ops.flash_attention as fa

    rng = np.random.RandomState(10)
    q, k, v = (jnp.asarray(rng.randn(1, 1, 8, 4096), jnp.float32) for _ in range(3))

    def count(name):
        calls = []
        orig = getattr(fa, name)

        def w(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(fa, name, w)
        return calls

    # default ON for long-L self-attn (round-5 stage D e2e win); "0" disengages
    assert fa._nomax_auto(4096, 4096) and not fa._nomax_auto(1024, 1024)
    monkeypatch.setattr(fa, "_NOMAX", "0")
    assert not fa._nomax_auto(4096, 4096)
    monkeypatch.setattr(fa, "_NOMAX", "1")
    nm = count("_flash_kernel_t_nomax")
    with pltpu.force_tpu_interpret_mode():
        # small q/k blocks force the multi-block branch (oneshot needs one)
        fa._flash_forward_t(q, k, v, block_q=1024, block_k=1024, oneshot=False)
    assert nm, "nomax kernel did not engage under DIFFMINING_FLASH_NOMAX=1"


def test_oneshot_underflow_edge_is_designed_divergence():
    """BEYOND the envelope the one-shot kernel diverges BY DESIGN: a row whose
    natural logits all sit below −87 (exp2 argument < −126) underflows p to 0
    and outputs ~0 where the online-softmax kernel still returns the correct
    (uniform) softmax. Pin the boundary so it stays documented behavior, not
    a surprise (ADVICE r4: envelope was stated optimistically as |logit|<88)."""
    import diffmining_tpu.ops.flash_attention as fa

    d, lq, lk = 8, 128, 256
    rng = np.random.RandomState(12)
    # all logits exactly −95 natural: q rows = a·e1, k rows = b·e1
    q = np.zeros((1, 1, d, lq), np.float32)
    k = np.zeros((1, 1, d, lk), np.float32)
    q[0, 0, 0, :] = -95.0 * np.sqrt(d)  # ÷√d scale in the kernel → −95
    k[0, 0, 0, :] = 1.0
    v = jnp.asarray(rng.randn(1, 1, d, lk), jnp.float32)
    q, k = jnp.asarray(q), jnp.asarray(k)
    want = np.asarray(
        sdpa_xla(*(a.transpose(0, 1, 3, 2) for a in (q, k, v)))
    ).transpose(0, 1, 3, 2)  # uniform softmax → mean of v, O(0.06) values
    with pltpu.force_tpu_interpret_mode():
        one = np.asarray(fa._flash_forward_t(q, k, v, oneshot=True))
        online = np.asarray(fa._flash_forward_t(q, k, v, oneshot=False))
    np.testing.assert_allclose(online, want, rtol=2e-3, atol=2e-3)
    assert np.abs(one).max() < 1e-20  # underflowed to ~0: the designed edge
    assert np.abs(want).max() > 1e-3  # ...which genuinely diverges from softmax


@pytest.mark.parametrize(
    "b,h,lq,lk,d,logit_scale",
    [
        (1, 2, 256, 256, 40, 1.0),    # self-attn, single k block
        (1, 2, 256, 77, 80, 1.0),     # masked kv padding (exp2(NEG_INF)=0 path)
        (2, 1, 130, 130, 64, 1.0),    # non-multiple seq length
        (1, 1, 256, 256, 40, 12.0),   # adversarial: natural logits ~±55, near
                                      # the |logit|<88 fp32-exp2 envelope edge;
                                      # beyond 88 the kernel overflows BY DESIGN
    ],
)
def test_oneshot_nomax_matches_standard(b, h, lq, lk, d, logit_scale):
    """DIFFMINING_FLASH_ONESHOT: when the whole key row is one k block the
    transposed kernel drops the online max/rescale and computes
    exp2(logits)/sum — identical softmax as long as |natural logit| < 88
    (flash_attention.py:_flash_kernel_t_1shot). Pin equality vs XLA at
    normal AND adversarial logit magnitude. oneshot=True forces the kernel
    at these small shapes (the product gate only engages at L>=4096)."""
    import diffmining_tpu.ops.flash_attention as fa

    rng = np.random.RandomState(7)
    # scale q ONLY: natural-logit std ≈ logit_scale (q·k ~ N(0, s²d), ÷√d)
    q = jnp.asarray(rng.randn(b, h, lq, d) * logit_scale, jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    want = np.asarray(sdpa_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        o_t = fa._flash_forward_t(
            q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2),
            oneshot=True,
        )
    got = np.asarray(o_t.transpose(0, 1, 3, 2))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("l", [4096, pytest.param(20480, marks=pytest.mark.slow)])
def test_flash_large_l_block_regime(l):
    """The >=4096 block-shape switch (512x4096 full-row k blocks) and the
    beyond-16k regime that native-resolution mining reaches (a 1150px image
    is ~20k level-0 tokens) — interpret-mode equality vs XLA."""
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 1, l, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, l, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, l, 8), jnp.float32)
    want = np.asarray(sdpa_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_auto_gate_head_dim_bound():
    """The auto dispatcher must NOT route wide-head attention to the pallas
    kernel: the VAE mid-block single-head D=512 shape (models/vae.py:59-74)
    overruns the 16 MB scoped-VMEM limit at COMPILE time, which the sdpa()
    trace-time try/except cannot catch (observed: bench_dift VMEM OOM
    through the remote compile tunnel, round 4)."""
    from diffmining_tpu.ops.attention import _auto_use_pallas

    # UNet self-attention shapes: pallas wins, gate opens
    assert _auto_use_pallas((16, 8, 4096, 40), (16, 8, 4096, 40), on_tpu=True)
    assert _auto_use_pallas((16, 8, 1024, 80), (16, 8, 1024, 80), on_tpu=True)
    assert _auto_use_pallas((16, 8, 1024, 160), (16, 8, 1024, 160), on_tpu=True)
    # VAE mid-attention: single head, D=512 -> XLA
    assert not _auto_use_pallas((1, 1, 4096, 512), (1, 1, 4096, 512), on_tpu=True)
    assert not _auto_use_pallas((8, 1, 4096, 512), (8, 1, 4096, 512), on_tpu=True)
    # cross-attention (Lq != Lk) and short L stay on XLA; CPU never pallas
    assert not _auto_use_pallas((16, 8, 4096, 40), (16, 8, 77, 40), on_tpu=True)
    assert not _auto_use_pallas((16, 8, 256, 160), (16, 8, 256, 160), on_tpu=True)
    assert not _auto_use_pallas((16, 8, 4096, 40), (16, 8, 4096, 40), on_tpu=False)
