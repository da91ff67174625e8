"""Trainer smoke tests: loss decreases-or-runs, EMA, checkpoint/resume, export
round-trip into the typicality stage (SURVEY.md §5.4 two-tier scheme)."""
import json
import os
from os.path import join
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.finetuning.args import parse_args
from diffmining_tpu.finetuning.base import BaseTrainer
from diffmining_tpu.finetuning.train import (
    TrainStepBuilder,
    ema_decay_schedule,
    make_lr_schedule,
    make_optimizer,
)
from diffmining_tpu.typicality.compute import SD


DECADES = ["1930", "1990"]


@pytest.fixture(scope="module")
def ftt_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("ftt_train")
    rng = np.random.RandomState(0)
    for dec in DECADES:
        os.makedirs(join(root, dec))
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (36, 36, 3), dtype=np.uint8)).save(
                join(root, dec, f"f{dec}_{i}.jpg")
            )
    return str(root)


@pytest.fixture(scope="module")
def sd():
    return SD.init_tiny("ftt", DECADES)


def make_trainer(sd, ftt_data, out_dir, extra=()):
    argv = [
        "--data_path", ftt_data,
        "--output_dir", out_dir,
        "--train_batch_size", "2",
        "--max_train_steps", "3",
        "--resolution", "32",
        "--mixed_precision", "no",
        "--use_ema",
        "--num_inference_steps", "2",
        *extra,
    ]
    args = parse_args(argv)
    return BaseTrainer("ftt", args, sd=sd)


def test_train_step_runs_and_updates(sd):
    opt = make_optimizer(make_lr_schedule("constant", 1e-3, 0))
    b = TrainStepBuilder(
        unet=sd.unet, vae=sd.vae, clip=sd.clip, schedule=sd.schedule, optimizer=opt,
        vae_params=sd.vae_params, clip_params=sd.clip_params, use_ema=True,
    )
    state = b.init_state(sd.unet_params)
    step = b.build()
    images = jnp.zeros((2, 32, 32, 3))
    tokens = jnp.zeros((2, 77), jnp.int32)
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
    after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
    assert np.abs(after - before).max() > 0  # params moved
    # EMA at step 0: decay = 1/10 -> ema ≈ 0.1*old + 0.9*new... check it moved too
    ema = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    assert np.abs(ema - before).max() > 0


def test_ema_decay_ramp():
    assert float(ema_decay_schedule(jnp.asarray(0))) == pytest.approx(0.1)
    assert float(ema_decay_schedule(jnp.asarray(10**6))) == pytest.approx(0.9999)


def test_accumulate_every_matches_whole_batch():
    """k micro-steps through accumulate_every ≡ ONE inner step on the mean
    grad (the defining semantics of gradient accumulation), and mid-window
    micro-steps leave params bitwise untouched. accumulate_every exists
    because optax.MultiSteps runs the inner chain EVERY micro-step and
    where-selects — it cannot amortize the batch-independent optimizer chain
    (BENCH_NOTES round-5 stage A/E)."""
    import optax

    from diffmining_tpu.finetuning.train import accumulate_every

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(4, 3), jnp.float32),
              "b": jnp.asarray(rng.randn(7), jnp.float32)}
    grads = [jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        for _ in range(6)]
    k = 3
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.constant_schedule(1e-2)))

    acc_tx = accumulate_every(tx, k)
    st = acc_tx.init(params)
    p = params
    first_window_mids = []
    for i, g in enumerate(grads):
        upd, st = acc_tx.update(g, st, p)
        p = optax.apply_updates(p, upd)
        if i < k - 1:
            first_window_mids.append(np.asarray(p["w"]))
    assert int(st.gradient_step) == 2

    st2 = tx.init(params)
    q = params
    for j in range(2):
        window = grads[j * k:(j + 1) * k]
        mean = jax.tree_util.tree_map(
            lambda *gs: ((gs[0] + gs[1]) + gs[2]) / k, *window)
        upd, st2 = tx.update(mean, st2, q)
        q = optax.apply_updates(q, upd)

    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for m in first_window_mids:  # zero updates add exactly 0.0
        np.testing.assert_array_equal(m, np.asarray(params["w"]))


def test_accumulate_every_bf16_accumulator_close_to_f32():
    """acc_dtype=bf16 halves the accumulator (the lever that lets no-remat
    accum fit one 16 GB chip, BENCH_NOTES round-5 stage E) at a bounded
    numeric cost: final params stay close to the f32-accumulator path."""
    import optax

    from diffmining_tpu.finetuning.train import accumulate_every

    rng = np.random.RandomState(1)
    params = {"w": jnp.asarray(rng.randn(8, 5), jnp.float32)}
    grads = [{"w": jnp.asarray(rng.randn(8, 5), jnp.float32)} for _ in range(8)]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.constant_schedule(1e-2)))

    outs = {}
    for name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
        acc_tx = accumulate_every(tx, 4, acc_dtype=dt)
        st = acc_tx.init(params)
        p = params
        for g in grads:
            upd, st = acc_tx.update(g, st, p)
            p = optax.apply_updates(p, upd)
        outs[name] = np.asarray(p["w"])
    assert str(jnp.bfloat16) not in str(outs["bf16"].dtype)  # params stay fp32
    assert np.abs(outs["bf16"] - outs["f32"]).max() < 2e-3
    assert np.abs(outs["bf16"] - outs["f32"]).max() > 0  # and the dtype engaged


def test_train_step_accum_gates_params_and_ema(sd):
    """Through the FULL train step: non-boundary micro-steps leave params,
    EMA and the inner optimizer state untouched (the lax.cond actually
    routes); the boundary step moves all three."""
    opt = make_optimizer(make_lr_schedule("constant", 1e-3, 0), accum_steps=2)
    b = TrainStepBuilder(
        unet=sd.unet, vae=sd.vae, clip=sd.clip, schedule=sd.schedule, optimizer=opt,
        vae_params=sd.vae_params, clip_params=sd.clip_params, use_ema=True,
        accum_steps=2,
    )
    state = b.init_state(sd.unet_params)
    step = b.build()
    images = jnp.zeros((2, 32, 32, 3))
    tokens = jnp.zeros((2, 77), jnp.int32)
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
    mid = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    mid_ema = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(mid, before)      # micro-step: no apply
    np.testing.assert_array_equal(mid_ema, before)  # micro-step: no EMA
    assert int(state.opt_state.gradient_step) == 0
    state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
    after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    after_ema = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    assert np.abs(after - before).max() > 0
    assert np.abs(after_ema - before).max() > 0
    assert int(state.opt_state.gradient_step) == 1


def test_train_step_accum_static_matches_cond(sd, monkeypatch):
    """The statically specialized skip/emit programs (the default,
    DIFFMINING_ACCUM_STATIC) compute exactly what the single-program
    runtime-cond path computes — the static split exists for MEMORY (the
    cond barrier held grads + accumulator + updates live at once and OOMed
    every 512px accum row, BENCH_NOTES round-5 stage F), not for different
    math."""
    images = jnp.linspace(-1.0, 1.0, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    tokens = jnp.zeros((2, 77), jnp.int32)

    def run(static):
        monkeypatch.setenv("DIFFMINING_ACCUM_STATIC", "1" if static else "0")
        opt = make_optimizer(make_lr_schedule("constant", 1e-3, 0), accum_steps=2)
        b = TrainStepBuilder(
            unet=sd.unet, vae=sd.vae, clip=sd.clip, schedule=sd.schedule, optimizer=opt,
            vae_params=sd.vae_params, clip_params=sd.clip_params, use_ema=True,
            accum_steps=2,
        )
        state = b.init_state(sd.unet_params)
        step = b.build()
        assert step._accum_static is static  # the env gate ROUTES the build
        losses = []
        for _ in range(4):
            state, loss = step(state, images, tokens, jax.random.PRNGKey(7))
            losses.append(float(loss))
        return state, losses

    s_static, l_static = run(True)
    s_cond, l_cond = run(False)
    np.testing.assert_allclose(l_static, l_cond, rtol=1e-6)
    assert int(s_static.opt_state.gradient_step) == int(s_cond.opt_state.gradient_step) == 2
    assert int(s_static.opt_state.mini_step) == int(s_cond.opt_state.mini_step) == 0
    # identical math, but DIFFERENT programs: XLA fuses the mean/Adam chain
    # differently with vs without the cond, so last-ulp differences pass
    # through Adam's rsqrt — pin to 1e-5 absolute (params are O(0.3)), not
    # bitwise (measured max |Δ| 1.6e-6 after two optimizer steps)
    for a, b_ in zip(
        jax.tree_util.tree_leaves((s_static.params, s_static.ema_params, s_static.opt_state.acc)),
        jax.tree_util.tree_leaves((s_cond.params, s_cond.ema_params, s_cond.opt_state.acc)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_trainer_loop_accum_reference_step_semantics(sd, ftt_data, tmp_path_factory):
    """With gradient_accumulation_steps=k the trainer loop counts OPTIMIZER
    steps (the reference's accelerate loop increments global_step only under
    sync_gradients, cars.py:286): max_train_steps / checkpointing_steps are in
    optimizer-step units, micro-steps live in state.step, and resume recovers
    both counters."""
    out = str(tmp_path_factory.mktemp("accum_run"))
    extra = ("--gradient_accumulation_steps", "2",
             "--max_train_steps", "2",
             "--checkpointing_steps", "1")
    tr = make_trainer(sd, ftt_data, out, extra=extra)
    tr.train()
    assert int(tr.state.step) == 4    # micro-steps (train_step calls)
    assert tr.global_step == 2        # optimizer steps (reference units)
    assert int(tr.state.opt_state.gradient_step) == 2  # inner chain ran twice
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint-"))
    assert ckpts == ["checkpoint-1", "checkpoint-2"]  # optimizer-step names

    tr2 = make_trainer(sd, ftt_data, out,
                       extra=extra + ("--resume_from_checkpoint", "latest"))
    tr2.training_init()
    tr2.resume_training()
    assert tr2.global_step == 2 and tr2.micro_step == 4
    # 8 imgs / batch 2 = 4 micro-batches/epoch: 4 micro-steps = epoch 0 done
    assert tr2.first_epoch == 1 and tr2.resume_step == 0


@pytest.mark.slow  # ~80 s e2e probe (suite hygiene, VERDICT r4 #8)
def test_trainer_end_to_end(sd, ftt_data, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    tr = make_trainer(sd, ftt_data, out)
    export_dir = tr.train()
    assert os.path.isdir(join(out, "checkpoint-3"))
    assert os.path.isfile(join(export_dir, "model_index.json"))
    # dataset prompt distribution sanity: templates match the reference
    prompts = {tr.train_dataset.__getitem__(i, 0)["prompt"] for i in range(8) }
    assert any("A face portrait of the" in p for p in prompts)

    # resume: restores step counter and optimizer state
    tr2 = make_trainer(sd, ftt_data, out, extra=("--resume_from_checkpoint", "latest"))
    tr2.training_init()
    tr2.resume_training()
    assert int(tr2.state.step) == 3

    # export feeds straight back into the typicality stage (converter round-trip)
    sd2 = SD.from_pipeline_dir("ftt", export_dir, DECADES)
    a = jax.tree_util.tree_leaves(sd2.unet_params)[0]
    assert np.isfinite(np.asarray(a, dtype=np.float32)).all()


def test_async_checkpoint_pruning(sd, ftt_data, tmp_path_factory):
    """Async saves + total_limit: after train() every surviving checkpoint is
    finalized (orbax atomic rename) and the limit counts the newest save."""
    out = str(tmp_path_factory.mktemp("prune"))
    tr = make_trainer(
        sd, ftt_data, out,
        extra=("--checkpointing_steps", "1", "--checkpoints_total_limit", "2"),
    )
    tr.train()
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint-"))
    assert ckpts == ["checkpoint-2", "checkpoint-3"]
    # the async writes are durable + restorable once train() returns
    tr2 = make_trainer(sd, ftt_data, out, extra=("--resume_from_checkpoint", "latest"))
    tr2.training_init()
    tr2.resume_training()
    assert int(tr2.state.step) == 3

    # a crash mid-async-write leaves checkpoint-N/ holding only an orbax tmp
    # dir; resume-latest must fall back past it, and the next save must
    # garbage-collect it instead of counting it toward the limit
    os.makedirs(join(out, "checkpoint-9", "state.orbax-checkpoint-tmp-1"))
    tr3 = make_trainer(
        sd, ftt_data, out,
        extra=("--resume_from_checkpoint", "latest", "--checkpoints_total_limit", "2"),
    )
    tr3.training_init()
    tr3.resume_training()
    assert int(tr3.state.step) == 3  # not the garbage checkpoint-9
    tr3.save_checkpoint(4, wait=True)
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint-"))
    assert ckpts == ["checkpoint-3", "checkpoint-4"]  # 9's carcass collected
    tr3._ckptr.close()


def test_export_only_path(sd, ftt_data, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run2"))
    tr = make_trainer(sd, ftt_data, out)
    tr.train()
    exp = str(tmp_path_factory.mktemp("exp"))
    tr3 = make_trainer(
        sd, ftt_data, out,
        extra=("--export-only", "--resume_from_checkpoint", "latest", "--export-dir", exp),
    )
    result = tr3.train()
    assert result == exp
    assert os.path.isfile(join(exp, "unet", "diffusion_pytorch_model.safetensors"))
