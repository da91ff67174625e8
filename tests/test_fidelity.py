"""Fidelity harness tests + the N-convergence property of the typicality
estimator (SURVEY §4e machinery; the cross-implementation number itself needs
reference artifacts, PARITY.md 'validation limits')."""
import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmining_tpu.typicality.compute import SD
from diffmining_tpu.typicality.engine import TypicalityEngine, losses_to_reference_layout
from diffmining_tpu.utils.fidelity import (
    compare_typicality_dirs,
    map_correlation,
    patch_rank_correlation,
    pearson,
    spearman,
)


def test_pearson_spearman_basics():
    assert pearson(np.arange(10.0), np.arange(10.0)) == pytest.approx(1.0)
    assert pearson(np.arange(10.0), -np.arange(10.0)) == pytest.approx(-1.0)
    assert spearman([1, 2, 3], [10, 20, 30]) == pytest.approx(1.0)
    # monotone nonlinear map preserves spearman, not pearson
    x = np.linspace(0, 1, 20)
    assert spearman(x, np.exp(5 * x)) == pytest.approx(1.0)


def test_patch_rank_correlation_shared_keys():
    a = {"p1": 1.0, "p2": 2.0, "p3": 3.0, "only_a": 9.0}
    b = {"p1": 10.0, "p2": 30.0, "p3": 20.0, "only_b": 0.0}
    rho, n = patch_rank_correlation(a, b)
    assert n == 3
    assert rho < 1.0  # p2/p3 swapped


def test_map_correlation_self_is_one():
    g = np.random.RandomState(0).randn(4, 2, 4, 6, 6).astype(np.float16)
    assert map_correlation(g, g) == pytest.approx(1.0)


def test_compare_typicality_dirs(tmp_path):
    rng = np.random.RandomState(0)
    for side in ("ours", "theirs"):
        os.makedirs(tmp_path / side / "1930")
    g = rng.randn(4, 2, 4, 6, 6).astype(np.float16)
    np.save(tmp_path / "ours" / "1930" / "img.npy", g)
    np.save(tmp_path / "theirs" / "1930" / "img.npy", g + rng.randn(*g.shape).astype(np.float16) * 0.01)
    res = compare_typicality_dirs(str(tmp_path / "ours"), str(tmp_path / "theirs"))
    assert "1930/img.npy" in res
    assert res["__mean__"] > 0.9


@pytest.mark.slow  # ~100 s: numerics pin, not wiring (suite hygiene, VERDICT r4 #8)
def test_oneshot_chain_fidelity(monkeypatch):
    """The DEFAULT-ON one-shot no-max kernel must not move the typicality
    instrument: run the tiny UNet → MSE grid → typicality_map chain with
    every attention forced through the Pallas kernels (interpret mode),
    ONESHOT off vs all, and pin map agreement. Engagement is pinned by
    ROUTING (the kernels are mathematically identical inside the envelope,
    so a value-difference guard would be flaky — the round-4 silent-no-op
    lesson, VERDICT r4 weak #1/#2)."""
    from jax.experimental.pallas import tpu as pltpu

    import diffmining_tpu.ops.attention as attn
    import diffmining_tpu.ops.flash_attention as fa
    from diffmining_tpu.models.unet import UNet2DCondition, UNetConfig
    from diffmining_tpu.ops.pool import typicality_map

    cfg = UNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        num_attention_heads=4,
        down_block_has_attn=(True, True),
        norm_num_groups=8,
    )
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    N, hl, wl = 3, 16, 16  # L=256 level-0 self-attention
    noisy = jnp.asarray(rng.randn(N, hl, wl, 4), jnp.float32)
    ts = jnp.asarray([120, 350, 661], jnp.int32)
    ctx = jnp.asarray(rng.randn(N, 7, 32), jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), noisy[:1], ts[:1], ctx[:1])

    monkeypatch.setattr(attn, "_DEFAULT_BACKEND", "pallas")

    def loss_grid():
        with pltpu.force_tpu_interpret_mode():
            pred = unet.apply(params, noisy, ts, ctx)
        # [N, 1(cond), C, hl, wl] fp16 — the artifact layout, null mocked as cond+noise-free copy
        g = np.asarray((pred - noisy) ** 2, np.float16).transpose(0, 3, 1, 2)
        return np.stack([g, g * 1.1], axis=1)  # synthetic null channel, same both runs

    monkeypatch.setattr(fa, "_ONESHOT", "0")
    base = loss_grid()

    monkeypatch.setattr(fa, "_ONESHOT", "all")
    calls = []
    orig_1shot = fa._flash_kernel_t_1shot

    def counting_1shot(*a, **k):
        calls.append(1)
        return orig_1shot(*a, **k)

    monkeypatch.setattr(fa, "_flash_kernel_t_1shot", counting_1shot)
    fast = loss_grid()
    assert calls, "one-shot kernel did not engage under ONESHOT=all"

    H, W, K = 64, 64, 16
    m0 = np.asarray(typicality_map(jnp.asarray(base), H, W, K, K))
    m1 = np.asarray(typicality_map(jnp.asarray(fast), H, W, K, K))
    np.testing.assert_allclose(m1, m0, rtol=5e-3, atol=1e-4)
    assert pearson(m0, m1) > 0.9999


def test_n_convergence_of_typicality_estimator():
    """More (eps,t) draws -> more stable maps: the split-half correlation of
    the estimator must increase with N (the property that makes N=100 a
    sensible production constant, reference compute.py:106)."""
    sd = SD.init_tiny("ftt", ["1930"])
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    ctx_c = jax.random.normal(jax.random.PRNGKey(1), (77, 32))
    ctx = jnp.stack([ctx_c, ctx_c * 0.5])[None]

    def half_corr(n):
        eng_a = TypicalityEngine(
            unet=sd.unet, unet_params=sd.unet_params, schedule=sd.schedule,
            n_samples=n, chunk=min(n, 4), t_min=0.1, t_max=0.7, dtype=jnp.float32, seed=1,
        )
        eng_b = TypicalityEngine(
            unet=sd.unet, unet_params=sd.unet_params, schedule=sd.schedule,
            n_samples=n, chunk=min(n, 4), t_min=0.1, t_max=0.7, dtype=jnp.float32, seed=2,
        )
        ga = losses_to_reference_layout(eng_a.compute(lat, ctx, [7])[0])
        gb = losses_to_reference_layout(eng_b.compute(lat, ctx, [7])[0])
        return map_correlation(ga, gb)

    c_small, c_big = half_corr(4), half_corr(24)
    assert c_big > c_small  # independent-seed agreement grows with N
