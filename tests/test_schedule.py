"""Numerical tests of the diffusion schedule math (SURVEY.md §4a).

Oracle values follow the closed forms of the DDPM/DDIM papers and the
scheduler configs SD-v1.5 ships (scaled_linear 0.00085->0.012, T=1000) —
checked against independently recomputed numpy, not against our own code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmining_tpu.diffusion import schedule as S


@pytest.fixture(scope="module")
def sched():
    return S.make_schedule()


def test_scaled_linear_constants(sched):
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-5)
    # well-known SD-v1.5 endpoint values
    assert abs(float(sched.alphas_cumprod[0]) - (1 - 0.00085)) < 1e-6
    assert float(sched.alphas_cumprod[-1]) < 0.005


def test_add_noise_closed_form(sched):
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 4, 4, 3).astype(np.float32)
    eps = rng.randn(2, 4, 4, 3).astype(np.float32)
    t = np.array([13, 977], dtype=np.int32)
    got = np.asarray(S.add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t)))
    acp = np.asarray(sched.alphas_cumprod)
    want = np.sqrt(acp[t])[:, None, None, None] * x0 + np.sqrt(1 - acp[t])[:, None, None, None] * eps
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_add_noise_scalar_t(sched):
    x0 = jnp.ones((1, 2, 2, 4))
    eps = jnp.zeros((1, 2, 2, 4))
    out = S.add_noise(sched, x0, eps, jnp.asarray(500))
    assert out.shape == x0.shape
    np.testing.assert_allclose(np.asarray(out), np.sqrt(float(sched.alphas_cumprod[500])), rtol=1e-5)


def test_velocity_identity(sched):
    """v-target is orthogonal rotation: eps = sqrt(acp) v + sqrt(1-acp) x0... check
    consistency via eps_from_pred round-trip."""
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 2), dtype=jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 2), dtype=jnp.float32)
    t = jnp.asarray([400])
    v = S.get_velocity(sched, x0, eps, t)
    x_t = S.add_noise(sched, x0, eps, t)
    v_sched = S.make_schedule(prediction_type="v_prediction")
    eps_back = S.eps_from_pred(v_sched, v, x_t, t)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps), rtol=1e-4, atol=1e-5)


def test_ddim_roundtrip_invert_then_step(sched):
    """ddim_inverse_step then ddim_step with the same eps must reconstruct x."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 4), dtype=jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 4), dtype=jnp.float32)
    t, t_next = jnp.asarray(100), jnp.asarray(120)
    x_up = S.ddim_inverse_step(sched, x, eps, t, t_next)
    x_back = S.ddim_step(sched, x_up, eps, t_next, t)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_ddim_step_to_boundary(sched):
    """t_prev < 0 maps to the clean image when eps is the true noise."""
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.randn(1, 2, 2, 4), dtype=jnp.float32)
    eps = jnp.asarray(rng.randn(1, 2, 2, 4), dtype=jnp.float32)
    t = jnp.asarray(1)
    x_t = S.add_noise(sched, x0, eps, t)
    x_rec = S.ddim_step(sched, x_t, eps, t, jnp.asarray(-1))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_ddpm_step_t0_is_posterior_mean(sched):
    rng = np.random.RandomState(4)
    x0 = jnp.asarray(0.5 * rng.randn(1, 2, 2, 4), dtype=jnp.float32)
    eps = jnp.asarray(rng.randn(1, 2, 2, 4), dtype=jnp.float32)
    x_t = S.add_noise(sched, x0, eps, jnp.asarray(0))
    noise = jnp.asarray(rng.randn(1, 2, 2, 4), dtype=jnp.float32)
    out = S.ddpm_step(sched, x_t, eps, jnp.asarray(0), noise)
    # at t=0 no noise is added and x0 (clipped) is recovered exactly
    np.testing.assert_allclose(np.asarray(out), np.clip(np.asarray(x0), -1, 1), rtol=1e-4, atol=1e-5)


def test_ddim_timesteps_leading_offset():
    ts = S.ddim_timesteps(50)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_bf16_inputs_fp32_coeffs(sched):
    x0 = jnp.ones((1, 2, 2, 4), dtype=jnp.bfloat16)
    eps = jnp.ones((1, 2, 2, 4), dtype=jnp.bfloat16)
    out = S.add_noise(sched, x0, eps, jnp.asarray([999]))
    assert out.dtype == jnp.bfloat16
