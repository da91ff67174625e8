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
