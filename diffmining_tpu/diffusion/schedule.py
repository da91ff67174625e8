"""Diffusion noise-schedule math as pure functions of ``alphas_cumprod``.

TPU-native replacement for the diffusers DDPM/DDIM scheduler objects the
reference uses (reference: diffmining/typicality/compute.py:99 `add_noise`,
applications/parallel-dataset/pnp.py:157-203 DDIM inversion/step).  Everything
here is a pure jnp function suitable for use inside jit/scan; the schedule
itself is a small NamedTuple of arrays computed once on host.

SD-v1.5 uses the "scaled_linear" beta schedule: beta_start=0.00085,
beta_end=0.012, 1000 train timesteps, eps-prediction (the scheduler config the
reference loads at finetuning/cars.py:116). We read these values from the
checkpoint's scheduler config when available (utils/weights.py) rather than
assuming them.
"""
from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

PredictionType = Literal["epsilon", "v_prediction"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion schedule constants.

    Attributes:
      betas: [T] float32 noise variances.
      alphas_cumprod: [T] float32 cumulative products of (1 - beta).
      num_train_timesteps: static T (not traced).
      prediction_type: "epsilon" | "v_prediction" (static).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: PredictionType = "epsilon",
) -> Schedule:
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(num_train_timesteps, dtype=np.float64)
        betas = np.minimum(1 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(ts / num_train_timesteps), 0.999)
    else:
        raise ValueError(f"unknown beta_schedule {beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return Schedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


def _gather_sqrt_coeffs(schedule: Schedule, timesteps: jax.Array, ndim: int):
    """sqrt(acp_t), sqrt(1-acp_t) broadcast to an ndim-rank tensor."""
    acp = schedule.alphas_cumprod[timesteps]
    shape = timesteps.shape + (1,) * (ndim - timesteps.ndim)
    sqrt_acp = jnp.sqrt(acp).reshape(shape)
    sqrt_om = jnp.sqrt(1.0 - acp).reshape(shape)
    return sqrt_acp, sqrt_om


def add_noise(schedule: Schedule, x0: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
    """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

    ``timesteps`` is int32 of shape [] or [B] (one per leading batch element).
    Computation in the dtype of x0 (bf16 on TPU), coefficients in fp32.
    """
    sqrt_acp, sqrt_om = _gather_sqrt_coeffs(schedule, timesteps, x0.ndim)
    return (sqrt_acp * x0.astype(jnp.float32) + sqrt_om * noise.astype(jnp.float32)).astype(x0.dtype)


def get_velocity(schedule: Schedule, x0: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
    """v-prediction target: sqrt(acp_t) eps − sqrt(1-acp_t) x0."""
    sqrt_acp, sqrt_om = _gather_sqrt_coeffs(schedule, timesteps, x0.ndim)
    return (sqrt_acp * noise.astype(jnp.float32) - sqrt_om * x0.astype(jnp.float32)).astype(x0.dtype)


def pred_x0_from_eps(schedule: Schedule, x_t: jax.Array, eps: jax.Array, timesteps: jax.Array) -> jax.Array:
    sqrt_acp, sqrt_om = _gather_sqrt_coeffs(schedule, timesteps, x_t.ndim)
    return (x_t.astype(jnp.float32) - sqrt_om * eps.astype(jnp.float32)) / sqrt_acp


def eps_from_pred(
    schedule: Schedule, model_out: jax.Array, x_t: jax.Array, timesteps: jax.Array
) -> jax.Array:
    """Convert a model output (eps- or v-parameterized) into eps."""
    if schedule.prediction_type == "epsilon":
        return model_out
    sqrt_acp, sqrt_om = _gather_sqrt_coeffs(schedule, timesteps, x_t.ndim)
    return (sqrt_acp * model_out.astype(jnp.float32) + sqrt_om * x_t.astype(jnp.float32)).astype(model_out.dtype)


def ddim_step(
    schedule: Schedule,
    x_t: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
    eta: float = 0.0,
    noise: jax.Array | None = None,
) -> jax.Array:
    """One deterministic (eta=0) or stochastic DDIM update x_t -> x_{t_prev}.

    ``t_prev < 0`` is treated as the clean-image boundary (acp=1).
    """
    acp_t = schedule.alphas_cumprod[t]
    acp_prev = jnp.where(t_prev >= 0, schedule.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
    bshape = (t.shape + (1,) * (x_t.ndim - t.ndim)) if hasattr(t, "shape") else ()
    acp_t = jnp.reshape(acp_t, bshape) if bshape else acp_t
    acp_prev = jnp.reshape(acp_prev, bshape) if bshape else acp_prev

    x_t32, eps32 = x_t.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = (x_t32 - jnp.sqrt(1.0 - acp_t) * eps32) / jnp.sqrt(acp_t)
    if eta > 0.0:
        sigma = eta * jnp.sqrt((1 - acp_prev) / (1 - acp_t)) * jnp.sqrt(1 - acp_t / acp_prev)
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps32
        x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt + sigma * noise.astype(jnp.float32)
    else:
        x_prev = jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps32
    return x_prev.astype(x_t.dtype)


def ddim_inverse_step(
    schedule: Schedule, x_t: jax.Array, eps: jax.Array, t: jax.Array, t_next: jax.Array
) -> jax.Array:
    """One DDIM inversion update x_t -> x_{t_next} with t_next > t.

    Mirrors the reference's Preprocess.ddim_inversion update rule
    (applications/parallel-dataset/pnp.py:157-180) as a pure function:
    x0-estimate at t, re-noised to t_next. ``t < 0`` means the clean boundary.
    """
    acp_t = jnp.where(t >= 0, schedule.alphas_cumprod[jnp.maximum(t, 0)], 1.0)
    acp_next = schedule.alphas_cumprod[t_next]
    x_t32, eps32 = x_t.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = (x_t32 - jnp.sqrt(1.0 - acp_t) * eps32) / jnp.sqrt(acp_t)
    x_next = jnp.sqrt(acp_next) * x0 + jnp.sqrt(1.0 - acp_next) * eps32
    return x_next.astype(x_t.dtype)


def ddpm_step(
    schedule: Schedule,
    x_t: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    clip_sample: bool = True,
) -> jax.Array:
    """One ancestral DDPM update x_t -> x_{t-1} (variance type fixed_small).

    SD-v1.5's DDPMScheduler config has clip_sample=True.
    """
    acp_t = schedule.alphas_cumprod[t]
    acp_prev = jnp.where(t > 0, schedule.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    beta_t = schedule.betas[t]
    alpha_t = 1.0 - beta_t

    x_t32, eps32 = x_t.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = (x_t32 - jnp.sqrt(1.0 - acp_t) * eps32) / jnp.sqrt(acp_t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * x_t32
    var = jnp.clip(beta_t * (1.0 - acp_prev) / (1.0 - acp_t), 1e-20, None)
    x_prev = jnp.where(t > 0, mean + jnp.sqrt(var) * noise.astype(jnp.float32), mean)
    return x_prev.astype(x_t.dtype)


def ddim_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    steps_offset: int = 1,
) -> np.ndarray:
    """Descending inference timesteps, "leading" spacing + steps_offset.

    Matches the DDIMScheduler config SD-v1.5 ships (steps_offset=1), i.e. for
    50 steps: [981, 961, ..., 21, 1].
    """
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
    ts = ts + steps_offset
    return np.clip(ts, 0, num_train_timesteps - 1).astype(np.int32)
