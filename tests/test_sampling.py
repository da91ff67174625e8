"""DDIM sampler with CFG (diffusion/sampling.py) — the training-preview and
PnP sampling core (reference cars.py:235-255 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmining_tpu.diffusion.sampling import ddim_inversion, sample_ddim
from diffmining_tpu.diffusion.schedule import make_schedule
from diffmining_tpu.typicality.compute import SD


@pytest.fixture(scope="module")
def setup():
    sd = SD.init_tiny("ftt", ["1930"])
    eps_fn = lambda p, x, t, c: sd.unet.apply(p, x, t, c)
    return sd, eps_fn


def test_sample_ddim_shapes_and_finite(setup):
    sd, eps_fn = setup
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 32))
    uncond = jnp.zeros_like(cond)
    out = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, cond, uncond,
                      num_inference_steps=4, guidance_scale=7.5)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_scale_changes_result(setup):
    sd, eps_fn = setup
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    uncond = jnp.zeros_like(cond)
    a = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, cond, uncond, 3, guidance_scale=1.0)
    b = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, cond, uncond, 3, guidance_scale=7.5)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_cfg_identity_when_cond_equals_uncond(setup):
    """guidance collapses when cond == uncond: scale must not matter."""
    sd, eps_fn = setup
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    a = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, ctx, ctx, 3, guidance_scale=1.0)
    b = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, ctx, ctx, 3, guidance_scale=7.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_eta_stochastic(setup):
    sd, eps_fn = setup
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    a = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, ctx, ctx, 3, eta=1.0, rng=jax.random.PRNGKey(5))
    b = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, ctx, ctx, 3, eta=1.0, rng=jax.random.PRNGKey(6))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_inversion_trajectory_shapes(setup):
    sd, eps_fn = setup
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    x_T, traj = ddim_inversion(eps_fn, sd.unet_params, sd.schedule, lat, ctx, num_steps=5)
    assert traj.shape == (5, 1, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(x_T))
