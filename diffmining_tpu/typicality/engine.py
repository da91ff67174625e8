"""The typicality engine: batched paired cond/null eps-prediction sweeps.

TPU-first redesign of the reference's hot loop (reference: diffmining/
typicality/compute.py:95-160). The reference computes, per image, N=100
(eps, t) draws × {cond, null} in micro-batches of 10 through the UNet —
one image at a time. Here the whole sweep is ONE jitted scan:

    losses[n, b, c] = (unet(add_noise(x_b, eps_{n,b}, t_{n,b}), t_{n,b}, emb_c)
                       − eps_{n,b})²     (elementwise, fp32 accumulate)

vmapped over images b (same-shape bucket) and conditions c, scanned over
sample chunks n, with the flattened UNet batch sharded over the device mesh's
"dp" axis. Typicality is then T(x|c) = mean_n[L(null) − L(c)].

RNG: deterministic `fold_in(seed_key, image_uid)` replaces the reference's
`torch.manual_seed(42)` + CUDA randn (compute.py:139). Exact noise values
differ from torch by design; parity is defined at the typicality-map /
cluster-rank level (SURVEY.md §7 hard part 2).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffmining_tpu.diffusion.schedule import Schedule, add_noise
from diffmining_tpu.models.unet import UNet2DCondition


def sample_noise_and_t(
    key: jax.Array,
    n_samples: int,
    latent_shape: Tuple[int, ...],
    t_min: float,
    t_max: float,
    num_train_timesteps: int = 1000,
) -> Tuple[jax.Array, jax.Array]:
    """Draw N (eps, t) pairs for one image: eps [N, h, w, C], t [N] int32.

    t ~ Uniform{int(t_min*T) .. int(t_max*T)-1}, the reference's range
    (compute.py:118-120).
    """
    knoise, kt = jax.random.split(key)
    noise = jax.random.normal(knoise, (n_samples,) + tuple(latent_shape), dtype=jnp.float32)
    lo = int(t_min * num_train_timesteps)
    hi = max(int(t_max * num_train_timesteps), lo + 1)
    t = jax.random.randint(kt, (n_samples,), lo, hi, dtype=jnp.int32)
    return noise, t


@functools.partial(
    jax.jit,
    static_argnames=("unet", "n_samples", "chunk", "t_lo", "t_hi", "dedup_prefix"),
)
def sweep_losses(
    unet: UNet2DCondition,  # static: flax modules hash by config, so every
    # engine over the same architecture shares ONE compiled sweep (a per-
    # instance eps_fn closure would recompile per category)
    params: Any,
    schedule: Schedule,
    latents: jax.Array,  # [B, h, w, C] clean latents (one shape bucket)
    ctx: jax.Array,  # [B, n_cond, L, D] text embeddings per image
    keys: jax.Array,  # [B] per-image fold_in'ed PRNG keys
    n_samples: int,
    chunk: int,
    t_lo: int,
    t_hi: int,
    dedup_prefix: bool = False,
) -> jax.Array:
    """Returns per-pixel losses [B, N, n_cond, h, w, C] in fp16.

    The UNet batch per scan step is chunk*B*n_cond; lay out conditions
    adjacently so cond/null share the noisy latent (computed once).
    """
    B, h, w, C = latents.shape
    n_cond = ctx.shape[1]

    def draw(key):
        kn, kt = jax.random.split(key)
        noise = jax.random.normal(kn, (n_samples, h, w, C), dtype=jnp.float32)
        t = jax.random.randint(kt, (n_samples,), t_lo, t_hi, dtype=jnp.int32)
        return noise, t

    noises, ts = jax.vmap(draw)(keys)  # [B, N, h, w, C], [B, N]

    n_chunks = n_samples // chunk
    assert n_samples % chunk == 0, "n_samples must be divisible by chunk"
    # reshape to scan layout [n_chunks, chunk, ...], leading axis B second
    noises = noises.reshape(B, n_chunks, chunk, h, w, C).transpose(1, 0, 2, 3, 4, 5)
    ts = ts.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    lat_dtype = latents.dtype

    def step(_, nt):
        noise_c, t_c = nt  # [B, chunk, h, w, C], [B, chunk]
        noisy = add_noise(
            schedule,
            latents[:, None].astype(jnp.float32),
            noise_c,
            t_c,
        )  # [B, chunk, h, w, C]
        ctx_b = jnp.broadcast_to(ctx[:, None], (B, chunk) + ctx.shape[1:])
        ctx_b = ctx_b.reshape(B * chunk * n_cond, *ctx.shape[2:])
        if dedup_prefix:
            # cond/null share the noisy latent AND t: feed the B*chunk unique
            # rows and let the UNet tile at the first cross-attention
            # (models/unet.py ctx_tile) — the condition-independent prefix
            # (conv_in, first resnet, the L=h*w self-attention) runs once per
            # (image, sample) instead of n_cond times.
            noisy_b = noisy.reshape(B * chunk, h, w, C).astype(lat_dtype)
            t_b = t_c.reshape(-1)
            pred = unet.apply(params, noisy_b, t_b, ctx_b, ctx_tile=n_cond)
        else:
            # tile over conditions up front: batch = B*chunk*n_cond
            noisy_b = jnp.broadcast_to(noisy[:, :, None], (B, chunk, n_cond, h, w, C))
            noisy_b = noisy_b.reshape(B * chunk * n_cond, h, w, C).astype(lat_dtype)
            t_b = jnp.broadcast_to(t_c[:, :, None], (B, chunk, n_cond)).reshape(-1)
            pred = unet.apply(params, noisy_b, t_b, ctx_b)
        pred = pred.reshape(B, chunk, n_cond, h, w, C)
        # fp32 pred vs noise, elementwise MSE (reference compute.py:101)
        loss = (pred.astype(jnp.float32) - noise_c[:, :, None]) ** 2
        return None, loss.astype(jnp.float16)

    _, losses = jax.lax.scan(step, None, (noises, ts))
    # [n_chunks, B, chunk, n_cond, h, w, C] -> [B, N, n_cond, h, w, C]
    losses = losses.transpose(1, 0, 2, 3, 4, 5, 6).reshape(B, n_samples, n_cond, h, w, C)
    return losses


@dataclasses.dataclass
class TypicalityEngine:
    """Bundles the jittable pieces for the sweep over one latent-shape bucket.

    With a `mesh`, the image batch is sharded over the "dp" axis and XLA
    partitions the whole scan — the multi-chip replacement for the reference's
    SLURM-array file sharding (which is kept too, at the host level)."""

    unet: UNet2DCondition
    unet_params: Any
    schedule: Schedule
    seed: int = 42
    n_samples: int = 100
    t_min: float = 0.0
    t_max: float = 1.0
    chunk: int = 10
    dtype: Any = jnp.bfloat16
    mesh: Any = None
    cast_params: bool = True
    # run the condition-independent UNet prefix once per (image, sample) and
    # tile at the first cross-attention (None = env DIFFMINING_SWEEP_DEDUP,
    # default ON; set =0 to revert to the reference's up-front tiling)
    dedup_prefix: Any = None

    def __post_init__(self):
        self._base_key = jax.random.PRNGKey(self.seed)
        if self.dedup_prefix is None:
            import os

            self.dedup_prefix = os.environ.get("DIFFMINING_SWEEP_DEDUP", "1") != "0"
        if self.cast_params and self.dtype == jnp.bfloat16:
            # inference sweep: bf16 weights halve HBM weight traffic; the
            # loss is still accumulated in fp32 (sweep_losses)
            self.unet_params = jax.tree_util.tree_map(
                lambda x: x.astype(self.dtype) if hasattr(x, "astype") and x.dtype == jnp.float32 else x,
                self.unet_params,
            )
        # the scan needs chunk | n_samples; snap to the largest divisor
        if self.n_samples % self.chunk != 0:
            c = min(self.chunk, self.n_samples)
            while self.n_samples % c != 0:
                c -= 1
            self.chunk = c

    def image_key(self, image_uid: int) -> jax.Array:
        return jax.random.fold_in(self._base_key, image_uid)

    def compute(self, latents: jax.Array, ctx: jax.Array, image_uids) -> jax.Array:
        """latents [B,h,w,C], ctx [B,n_cond,L,D] (or [n_cond,L,D] shared),
        image_uids: int sequence of length B. Returns [B,N,n_cond,h,w,C] fp16."""
        B = latents.shape[0]
        if ctx.ndim == 3:
            ctx = jnp.broadcast_to(ctx[None], (B,) + ctx.shape)
        keys = jnp.stack([self.image_key(int(u)) for u in image_uids])
        t_lo = int(self.t_min * self.schedule.num_train_timesteps)
        t_hi = max(int(self.t_max * self.schedule.num_train_timesteps), t_lo + 1)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from diffmining_tpu.parallel.mesh import globalize_batch

            dp = self.mesh.shape["dp"]
            pad = (-B) % dp
            if pad:
                # pad-to-shardable rather than silently running unsharded
                # (an unannounced 1-chip fallback is an 8x perf loss on a pod)
                if not getattr(self, "_warned_pad", False):
                    print(
                        f"typicality: padding sweep batch {B} -> {B + pad} to shard "
                        f"over dp={dp}; set batch_images to a multiple of dp to "
                        f"avoid the padded work"
                    )
                    self._warned_pad = True
                assert jax.process_count() == 1 or not (
                    isinstance(latents, jax.Array) and not latents.is_fully_addressable
                ), "multi-host sweep batches must already divide dp (D pads groups to batch_images)"
                latents = jnp.concatenate([latents, jnp.repeat(latents[-1:], pad, axis=0)])
                ctx = jnp.concatenate([ctx, jnp.repeat(ctx[-1:], pad, axis=0)])
                keys = jnp.concatenate([keys, jnp.repeat(keys[-1:], pad, axis=0)])
            # multi-host: already-global arrays (e.g. the sharded VAE encode's
            # output) pass through; host arrays contribute per-process slices
            latents = globalize_batch(self.mesh, latents)
            ctx = globalize_batch(self.mesh, ctx)
            keys = globalize_batch(self.mesh, keys)
            if not hasattr(self, "_placed_params"):
                # no-op (no copy) when the caller shares an already-placed
                # tree, e.g. SD.sweep_params(mesh)
                self._placed_params = jax.device_put(
                    self.unet_params, NamedSharding(self.mesh, P())
                )
            out = sweep_losses(
                self.unet, self._placed_params, self.schedule,
                latents.astype(self.dtype), ctx, keys,
                self.n_samples, self.chunk, t_lo, t_hi,
                dedup_prefix=bool(self.dedup_prefix),
            )
            return out[:B] if pad else out
        return sweep_losses(
            self.unet,
            self.unet_params,
            self.schedule,
            latents.astype(self.dtype),
            ctx,
            keys,
            self.n_samples,
            self.chunk,
            t_lo,
            t_hi,
            dedup_prefix=bool(self.dedup_prefix),
        )


def losses_to_reference_layout(losses: jax.Array) -> np.ndarray:
    """[N, n_cond, h, w, C] (one image, NHWC) -> reference .npy layout
    [N, n_cond, C, h, w] fp16 (compute.py:158-160)."""
    arr = np.asarray(losses)
    return np.ascontiguousarray(arr.transpose(0, 1, 4, 2, 3)).astype(np.float16)


def reference_layout_to_losses(arr: np.ndarray) -> np.ndarray:
    """Inverse: [N, n_cond, C, h, w] -> [N, n_cond, h, w, C]."""
    return np.ascontiguousarray(arr.transpose(0, 1, 3, 4, 2))
