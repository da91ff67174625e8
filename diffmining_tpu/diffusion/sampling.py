"""DDIM sampling with classifier-free guidance as a lax.scan.

Replaces the diffusers StableDiffusionPipeline sampling loop the reference
uses for training previews (reference: finetuning/cars.py:235-255 — 50 DDIM
steps, CFG 7.5, negative prompt) and the PnP sample loop
(applications/parallel-dataset/pnp.py:538-577).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from diffmining_tpu.diffusion.schedule import Schedule, ddim_step, ddim_timesteps, eps_from_pred


def sample_ddim(
    eps_fn: Callable,  # (params, x, t, ctx) -> eps
    params: Any,
    schedule: Schedule,
    latents: jax.Array,  # [B, h, w, C] N(0,1) init
    cond_ctx: jax.Array,  # [B, L, D]
    uncond_ctx: jax.Array,  # [B, L, D]
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns denoised latents [B, h, w, C].

    One batched UNet call per step evaluates cond and uncond together
    (batch 2B), like the reference pipeline's chunked CFG.
    """
    B = latents.shape[0]
    ts = jnp.asarray(ddim_timesteps(num_inference_steps, schedule.num_train_timesteps))
    ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1], dtype=ts.dtype)])
    ctx = jnp.concatenate([uncond_ctx, cond_ctx], axis=0)
    if eta > 0.0 and rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, tt):
        x, key = carry
        t, t_prev = tt
        xx = jnp.concatenate([x, x], axis=0)
        tb = jnp.broadcast_to(t, (2 * B,))
        pred = eps_fn(params, xx, tb, ctx)
        pred = eps_from_pred(schedule, pred, xx, tb)
        eps_u, eps_c = jnp.split(pred, 2, axis=0)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        if eta > 0.0:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, dtype=jnp.float32)
            x = ddim_step(schedule, x, eps, t, t_prev, eta=eta, noise=noise)
        else:
            x = ddim_step(schedule, x, eps, t, t_prev)
        return (x, key), None

    key0 = rng if rng is not None else jax.random.PRNGKey(0)
    (x, _), _ = jax.lax.scan(step, (latents, key0), (ts, ts_prev))
    return x


def ddim_inversion(
    eps_fn: Callable,
    params: Any,
    schedule: Schedule,
    latents: jax.Array,  # [B, h, w, C] clean latents
    ctx: jax.Array,  # [B, L, D] (inversion prompt, no CFG)
    num_steps: Optional[int] = None,
    save_every: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Full-trajectory DDIM inversion as a scan (reference pnp.py:157-180
    runs 999 sequential UNet calls storing every latent).

    Returns (x_T, trajectory [S, B, h, w, C]) where S = num_steps//save_every
    latents ordered from low t to high t.
    """
    T = schedule.num_train_timesteps
    num_steps = num_steps or (T - 1)
    ts = jnp.arange(0, num_steps, dtype=jnp.int32)  # predict eps at t, go to t+1
    B = latents.shape[0]

    from diffmining_tpu.diffusion.schedule import ddim_inverse_step

    def step(x, t):
        # x is at noise level t-1; evaluate eps at the target level t (the
        # reference's inversion uses the target-step eps, pnp.py:157-180)
        tb = jnp.broadcast_to(t, (B,))
        eps = eps_fn(params, x, tb, ctx)
        eps = eps_from_pred(schedule, eps, x, tb)
        x_next = ddim_inverse_step(schedule, x, eps, t - 1, t)
        return x_next, x_next

    x, traj = jax.lax.scan(step, latents, ts + 1)
    if save_every > 1:
        traj = traj[::save_every]
    return x, traj
