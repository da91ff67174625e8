"""Functional training core: train state, jitted train step, EMA, sharding.

Rebuild of the reference's Accelerate-based step (reference: finetuning/
cars.py:257-300) as one pure jitted function over a device mesh:

  * VAE encode + CLIP encode + UNet forward + MSE + backward in ONE jit —
    the frozen towers run inside the step exactly as the reference does.
  * DP: batch sharded over mesh axis "dp"; XLA inserts the grad psum that
    DDP/NCCL did (cars.py:294). Loss "gather" for logging is the psum'd
    scalar (cars.py:290).
  * EMA is a pytree update inside the step (diffusers EMAModel semantics:
    decay ramp min(max_decay, (1+s)/(10+s)), training_utils).
  * grad clip + AdamW via optax; grad accumulation via accumulate_every
    (a lax.cond MultiSteps replacement that really skips the inner chain).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffmining_tpu.diffusion.schedule import Schedule, add_noise, get_velocity
from diffmining_tpu.models.clip import CLIPTextModel
from diffmining_tpu.models.unet import UNet2DCondition
from diffmining_tpu.models.vae import AutoencoderKL, sample_latent


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled


def make_lr_schedule(name: str, lr: float, warmup: int, total_steps: Optional[int] = None):
    if name == "constant":
        return optax.constant_schedule(lr)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)], [warmup]
        )
    if name == "linear":
        assert total_steps
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.linear_schedule(lr, 0.0, total_steps - warmup)],
            [warmup],
        )
    if name == "cosine":
        assert total_steps
        return optax.warmup_cosine_decay_schedule(0.0, lr, warmup, total_steps)
    if name == "cosine_with_restarts":
        assert total_steps
        n_cycles = 4
        period = max(1, (total_steps - warmup) // n_cycles)
        cosines = [optax.cosine_decay_schedule(lr, period) for _ in range(n_cycles)]
        bounds = [warmup + period * (i + 1) for i in range(n_cycles - 1)]
        return optax.join_schedules([optax.linear_schedule(0.0, lr, warmup)] + cosines, [warmup] + bounds)
    if name == "polynomial":
        assert total_steps
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.polynomial_schedule(lr, 0.0, 1.0, total_steps - warmup)],
            [warmup],
        )
    raise ValueError(name)


class AccumulateEveryState(NamedTuple):
    mini_step: jax.Array  # int32 in [0, every)
    gradient_step: jax.Array  # int32, # of EMITTED inner updates
    inner_state: Any
    acc: Any  # grad SUM in acc_dtype


class AccumulateEvery(NamedTuple):
    """optax.GradientTransformation duck-type that also carries the inner tx
    so TrainStepBuilder can bypass the runtime lax.cond with two statically
    specialized programs (see build())."""

    init: Callable
    update: Callable
    inner: optax.GradientTransformation
    every: int
    acc_dtype: Any


def accumulate_every(
    tx: optax.GradientTransformation, every: int, acc_dtype=None
) -> optax.GradientTransformation:
    """Gradient accumulation that actually SKIPS the inner optimizer chain.

    optax.MultiSteps runs the wrapped optimizer on EVERY micro-step and
    `where`-selects the emitted result (verified in its update() source), so
    the ~100 ms batch-INDEPENDENT clip+AdamW+8-bit chain (31% of the B=4
    train step, BENCH_NOTES round-5 stage A) would be paid every micro-step
    and accumulation would amortize nothing. Here the inner update sits under
    a real `lax.cond`: non-boundary micro-steps pay one accumulator add and
    return zero updates. The accumulator is stored in `acc_dtype` (default:
    the grads' own dtype) — bf16 halves the 3.4 GB fp32 UNet grad buffer
    whose addition OOMed the no-remat accum-16 row (round-5 stage E); the
    emitted mean is computed in the grads' dtype either way. Inner schedules
    see `gradient_step` counts (emitted updates), like MultiSteps.

    MEMORY caveat (round-5 stage F): as a generic optax transformation the
    emit decision is a traced value, so the lax.cond is a barrier — the full
    grad tree, the accumulator AND the full-tree `updates` output buffer are
    live simultaneously at the cond, which defeats XLA's per-tensor
    interleaving of the backward pass with the optimizer and OOMed every
    512px accum row on one 16 GB chip. TrainStepBuilder therefore bypasses
    this update() when it can see the window statically (the trainer loop
    knows the micro-step index) and compiles skip/emit as two separate
    programs; this cond path remains the reference semantics (equivalence
    pinned in test_finetune.py) and the path for generic optax use.
    """
    if every <= 1:
        return tx

    def init(params):
        return AccumulateEveryState(
            mini_step=jnp.zeros((), jnp.int32),
            gradient_step=jnp.zeros((), jnp.int32),
            inner_state=tx.init(params),
            acc=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, acc_dtype or p.dtype), params
            ),
        )

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), state.acc, grads
        )
        emit = state.mini_step == every - 1

        def _emit(acc, inner_state, params):
            mean = jax.tree_util.tree_map(
                lambda a, g: (a.astype(g.dtype)) / every, acc, grads
            )
            updates, new_inner = tx.update(mean, inner_state, params)
            return updates, new_inner, jax.tree_util.tree_map(jnp.zeros_like, acc)

        def _skip(acc, inner_state, params):
            return (
                jax.tree_util.tree_map(jnp.zeros_like, grads),
                inner_state,
                acc,
            )

        updates, inner_state, acc = jax.lax.cond(
            emit, _emit, _skip, acc, state.inner_state, params
        )
        new_state = AccumulateEveryState(
            mini_step=(state.mini_step + 1) % every,
            gradient_step=state.gradient_step + emit.astype(jnp.int32),
            inner_state=inner_state,
            acc=acc,
        )
        return updates, new_state

    return AccumulateEvery(init, update, inner=tx, every=every, acc_dtype=acc_dtype)


def make_optimizer(
    lr_schedule,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 1e-2,
    eps: float = 1e-8,
    max_grad_norm: float = 1.0,
    accum_steps: int = 1,
    use_8bit: bool = False,
    accum_dtype=None,
) -> optax.GradientTransformation:
    if use_8bit:
        # int8 moment storage (reference --use_8bit_adam via bitsandbytes)
        from diffmining_tpu.ops.optim8bit import adamw_8bit

        adam = adamw_8bit(lr_schedule, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay)
    else:
        adam = optax.adamw(lr_schedule, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), adam)
    return accumulate_every(tx, accum_steps, acc_dtype=accum_dtype)


def ema_decay_schedule(step: jax.Array, max_decay: float = 0.9999) -> jax.Array:
    """diffusers EMAModel default ramp: min(max_decay, (1+s)/(10+s))."""
    s = step.astype(jnp.float32)
    return jnp.minimum(max_decay, (1.0 + s) / (10.0 + s))


@dataclasses.dataclass
class TrainStepBuilder:
    unet: UNet2DCondition
    vae: AutoencoderKL
    clip: CLIPTextModel
    schedule: Schedule
    optimizer: optax.GradientTransformation
    vae_params: Any
    clip_params: Any
    use_ema: bool = False
    ema_max_decay: float = 0.9999
    mesh: Optional[Mesh] = None
    # gradient accumulation factor of `optimizer` (accumulate_every). The
    # step gates the param-apply + EMA tree passes under the same boundary
    # cond so non-boundary micro-steps pay only fwd+bwd+one accumulator add;
    # the EMA decay ramp counts OPTIMIZER steps (diffusers EMAModel.step runs
    # once per sync_gradients window, reference base.py via accelerate)
    accum_steps: int = 1
    # LoRA: state.params become the low-rank factors; the dense UNet params
    # stay frozen in `lora_base` and are merged inside the jitted loss
    # (reference base.py:199-205 attaches peft adapters instead)
    lora_rank: Optional[int] = None
    lora_base: Any = None

    def init_state(self, unet_params, rng: Optional[jax.Array] = None) -> TrainState:
        if self.lora_rank:
            from diffmining_tpu.finetuning.lora import init_lora_params

            self.lora_base = unet_params
            params = init_lora_params(unet_params, self.lora_rank, rng if rng is not None else jax.random.PRNGKey(0))
        else:
            # deep-copy: train_step donates the state, which would otherwise
            # kill the caller's (possibly shared) parameter buffers
            params = jax.tree_util.tree_map(jnp.copy, unet_params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params["params"]),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if self.use_ema else None,
        )

    def dense_params(self, state: TrainState, use_ema: bool = False) -> Any:
        """Dense UNet params for inference/export (merges LoRA if active)."""
        p = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        if self.lora_rank:
            from diffmining_tpu.finetuning.lora import merge_lora

            return merge_lora(self.lora_base, p)
        return p

    def build(self) -> Callable:
        vae, clip, unet, schedule, optimizer = self.vae, self.clip, self.unet, self.schedule, self.optimizer
        use_ema, ema_max_decay, accum = self.use_ema, self.ema_max_decay, self.accum_steps
        T = schedule.num_train_timesteps
        sf = vae.config.scaling_factor
        lora_active = self.lora_rank is not None
        # Static accumulation windows: the trainer loop KNOWS the micro-step
        # index, so the emit decision need not be a traced value. Compiling
        # skip/emit as two separate programs removes the lax.cond barrier at
        # which the full 3.4 GB grad tree + accumulator + full-tree `updates`
        # output buffer were simultaneously live (the stage-F OOMs): in the
        # skip program XLA consumes each gradient into the accumulator as the
        # backward pass produces it, exactly as it interleaves Adam with the
        # backward in the non-accum step. DIFFMINING_ACCUM_STATIC=0 reverts
        # to the single-program runtime-cond path (accumulate_every.update).
        import os as _os

        accum_static = (
            accum > 1
            and isinstance(optimizer, AccumulateEvery)
            and _os.environ.get("DIFFMINING_ACCUM_STATIC", "1") != "0"
        )

        # frozen params enter as jit ARGUMENTS, not closure constants: closed-
        # over arrays are embedded into the serialized HLO, which bloats every
        # compile by ~800 MB (VAE+CLIP, plus the 3.4 GB dense UNet under LoRA)
        # and overflows the axon relay's remote-compile request limit
        def make_train_step(mode):
            """mode: None = single program (runtime cond when accum>1);
            "skip"/"emit" = statically specialized accumulation micro-step."""

            def train_step(state: TrainState, images, tokens, rng, vae_params, clip_params, lora_base):
                """images [B,H,W,3] fp32 in [-1,1]; tokens [B,77] int32."""
                k_lat, k_noise, k_t = jax.random.split(jax.random.fold_in(rng, state.step), 3)

                mean, logvar = vae.apply(vae_params, images)
                latents = sample_latent(mean, logvar, k_lat, sf)
                noise = jax.random.normal(k_noise, latents.shape, dtype=jnp.float32)
                bsz = latents.shape[0]
                t = jax.random.randint(k_t, (bsz,), 0, T, dtype=jnp.int32)
                noisy = add_noise(schedule, latents, noise, t)
                ctx = clip.apply(clip_params, tokens)
                if schedule.prediction_type == "epsilon":
                    target = noise
                else:
                    target = get_velocity(schedule, latents, noise, t)

                def loss_fn(params):
                    if lora_active:
                        from diffmining_tpu.finetuning.lora import merge_lora

                        apply_params = merge_lora(lora_base, params)
                    else:
                        apply_params = params
                    pred = unet.apply(apply_params, noisy, t, ctx)
                    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)

                def _apply_and_ema(operand):
                    p_old, upd, ema_old = operand
                    p_new = {"params": optax.apply_updates(p_old["params"], upd)}
                    if use_ema:
                        d = ema_decay_schedule(state.step // accum, ema_max_decay)
                        ema_new = jax.tree_util.tree_map(
                            lambda e, p: e * d + (1.0 - d) * p, ema_old, p_new
                        )
                    else:
                        ema_new = ema_old
                    return p_new, ema_new

                if mode is not None:
                    # statically specialized accumulation micro-step: same
                    # math as accumulate_every.update, emit known at trace
                    # time (equivalence pinned in test_finetune.py)
                    ost = state.opt_state
                    acc = jax.tree_util.tree_map(
                        lambda a, g: a + g.astype(a.dtype), ost.acc, grads["params"]
                    )
                    if mode == "skip":
                        opt_state = AccumulateEveryState(
                            mini_step=(ost.mini_step + 1) % accum,
                            gradient_step=ost.gradient_step,
                            inner_state=ost.inner_state,
                            acc=acc,
                        )
                        params, ema = state.params, state.ema_params
                    else:  # emit
                        mean_g = jax.tree_util.tree_map(
                            lambda a, g: a.astype(g.dtype) / accum, acc, grads["params"]
                        )
                        updates, inner = optimizer.inner.update(
                            mean_g, ost.inner_state, state.params["params"]
                        )
                        opt_state = AccumulateEveryState(
                            mini_step=(ost.mini_step + 1) % accum,
                            gradient_step=ost.gradient_step + 1,
                            inner_state=inner,
                            acc=jax.tree_util.tree_map(jnp.zeros_like, acc),
                        )
                        params, ema = _apply_and_ema((state.params, updates, state.ema_params))
                    new_state = TrainState(
                        step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
                    )
                    return new_state, loss

                updates, opt_state = optimizer.update(
                    grads["params"], state.opt_state, state.params["params"]
                )

                if accum > 1:
                    # non-boundary micro-steps: updates are zeros (accumulate_every
                    # skipped the chain); skip the params+EMA tree passes too
                    emit = (state.step % accum) == accum - 1
                    params, ema = jax.lax.cond(
                        emit,
                        _apply_and_ema,
                        lambda operand: (operand[0], operand[2]),
                        (state.params, updates, state.ema_params),
                    )
                else:
                    params, ema = _apply_and_ema((state.params, updates, state.ema_params))
                new_state = TrainState(
                    step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
                )
                return new_state, loss

            return train_step

        def _jit(fn):
            if self.mesh is not None:
                mesh = self.mesh
                repl = NamedSharding(mesh, P())
                data = NamedSharding(mesh, P("dp"))
                # batch/rng shardings are constrained explicitly; the state and
                # frozen towers keep their caller placement (None = committed
                # sharding), so the same step serves replicated AND fsdp-sharded
                # parameter layouts (parallel/mesh.shard_params)
                return jax.jit(
                    fn,
                    in_shardings=(None, data, data, repl, None, None, None),
                    out_shardings=(None, repl),
                    donate_argnums=(0,),
                )
            return jax.jit(fn, donate_argnums=(0,))

        builder = self

        if accum_static:
            jit_skip = _jit(make_train_step("skip"))
            jit_emit = _jit(make_train_step("emit"))
            counter = None  # python-side micro-step index (lazy sync once)

            def step(state, images, tokens, rng, emit=None):
                nonlocal counter
                if counter is None:
                    counter = int(state.step)  # one host sync at first call/resume
                e = (counter % accum) == accum - 1 if emit is None else bool(emit)
                counter += 1
                fn = jit_emit if e else jit_skip
                return fn(state, images, tokens, rng, builder.vae_params, builder.clip_params, builder.lora_base)

            step._accum_static = True  # introspection for tests/flag matrix
            return step

        jitted = _jit(make_train_step(None))

        def step(state, images, tokens, rng, emit=None):
            return jitted(state, images, tokens, rng, builder.vae_params, builder.clip_params, builder.lora_base)

        step._accum_static = False
        return step
