"""BaseTrainer: orchestration around the functional train step.

Rebuild of the reference's Accelerate trainer (reference: finetuning/base.py +
per-domain trainers cars.py/ftt.py/geo.py/places.py, xray/finetune.py). One
generic trainer covers every domain — the per-domain deltas (dataset class,
prompt templates, resolution, sampling prompts) live in finetuning/datasets.py
and the DOMAINS table below, instead of five near-duplicated trainer files.

Checkpoint scheme mirrors the reference's two tiers (SURVEY.md §5.4):
  * training checkpoints `checkpoint-{step}/` (orbax: params, opt state, EMA)
    with `--resume_from_checkpoint latest` scanning,
  * terminal/`--export-only` export to a diffusers-layout pipeline dir
    (consumed by the typicality stage).
"""
from __future__ import annotations

import dataclasses
import logging
import math
import os
import re
from os.path import join
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from diffmining_tpu.diffusion.sampling import sample_ddim
from diffmining_tpu.finetuning.datasets import DATASETS, BatchIterator
from diffmining_tpu.finetuning.train import (
    TrainStepBuilder,
    make_lr_schedule,
    make_optimizer,
)
from diffmining_tpu.models.clip import CLIPTextModel
from diffmining_tpu.models.tokenizer import CLIPTokenizer, tiny_tokenizer
from diffmining_tpu.models.unet import UNet2DCondition
from diffmining_tpu.models.vae import AutoencoderKL
from diffmining_tpu.parallel.mesh import make_mesh
from diffmining_tpu.utils.export import save_pipeline_dir
from diffmining_tpu.utils.figures import concat_images_width
from diffmining_tpu.utils.images import array_to_image

logger = logging.getLogger("diffmining_tpu.finetune")


@dataclasses.dataclass(frozen=True)
class DomainSpec:
    """Per-domain deltas (sampling prompts cite the reference lines)."""

    name: str
    sample_categories: tuple
    sample_prompt: str  # .format(c=category)
    negative_prompt: str
    resolution: int


DOMAINS: Dict[str, DomainSpec] = {
    # cars.py:107,246: countries list; 'A car at the {c}s.' neg 'A car'
    "cars": DomainSpec("cars", ("1880", "1940", "1980", "2000", "2010"), "A car at the {c}s.", "A car", 256),
    # ftt.py:97,242
    "ftt": DomainSpec(
        "ftt", ("1880", "1920", "1940", "1960", "1980", "2000"),
        "A face portrait from the {c}s.", "A face portrait", 256,
    ),
    # geo.py:111,255: 10-country sample list
    "geo": DomainSpec(
        "geo",
        ("France", "Japan", "United States", "Brazil", "India", "Italy", "Nigeria", "Russia", "Thailand", "United Kingdom"),
        "A google street view image in {c}", "A google street view image", 512,
    ),
    # places.py:254
    "places": DomainSpec("places", (), "An image of {c}.", "", 512),
    # xray/finetune.py
    "xray": DomainSpec(
        "xray", ("no finding", "Cardiomegaly", "Effusion", "Pneumonia"),
        "Chest X-Ray with {c}.", "Chest X-Ray.", 512,
    ),
}


class BaseTrainer:
    def __init__(self, which: str, args, sd=None, mesh=None):
        self.which = which
        self.args = args
        self.spec = DOMAINS[which]
        if mesh is None:
            dp = args.mesh_dp
            if dp is None:
                # dp must divide the global batch; use the largest such divisor
                n = len(jax.devices()) // args.mesh_fsdp
                dp = math.gcd(args.train_batch_size, n)
            mesh = make_mesh(dp=dp, fsdp=args.mesh_fsdp)
        self.mesh = mesh
        self.dtype = {"no": jnp.float32, "fp16": jnp.bfloat16, "bf16": jnp.bfloat16}[args.mixed_precision]
        self._init_models(sd)

    # ------------------------------------------------------------------

    def _init_models(self, sd=None):
        args = self.args
        if sd is not None:  # injected bundle (tests)
            self.unet, self.unet_params = sd.unet, sd.unet_params
            self.vae, self.vae_params = sd.vae, sd.vae_params
            self.clip, self.clip_params = sd.clip, sd.clip_params
            self.tokenizer, self.schedule = sd.tokenizer, sd.schedule
            self._apply_remat()
            return
        base = args.base_name_or_path
        if os.path.isdir(base):
            from diffmining_tpu.utils.weights import load_pipeline_dir, clip_config_from_json, convert_clip_text, load_safetensors_dir, _read_json

            p = load_pipeline_dir(base)
            self.unet = UNet2DCondition(p["unet"]["config"], dtype=self.dtype)
            self.unet_params = {"params": p["unet"]["params"]}
            self.vae = AutoencoderKL(p["vae"]["config"], dtype=self.dtype)
            self.vae_params = {"params": p["vae"]["params"]}
            te = p["text_encoder"]
            if args.clip_path:  # e.g. StreetCLIP for geo (reference geo.py:51)
                te = dict(
                    config=clip_config_from_json(_read_json(join(args.clip_path, "config.json"))),
                    params=convert_clip_text(load_safetensors_dir(args.clip_path)),
                )
            self.clip = CLIPTextModel(te["config"], dtype=self.dtype)
            self.clip_params = {"params": te["params"]}
            self.schedule = p["schedule"]
            tok_dir = p["tokenizer_dir"]
            if os.path.isfile(join(tok_dir, "vocab.json")):
                self.tokenizer = CLIPTokenizer.from_pretrained_dir(tok_dir)
            else:
                self.tokenizer = tiny_tokenizer(te["config"].vocab_size)
        else:
            raise FileNotFoundError(
                f"--base_name_or_path {base!r} is not a local pipeline dir; this "
                "zero-egress build cannot fetch hub checkpoints — convert one with "
                "utils/weights.py first"
            )
        self._apply_remat()

    def _apply_remat(self):
        """--gradient_checkpointing: rebuild the UNet with block remat
        (same params pytree; reference cars.py:130-132)."""
        if getattr(self.args, "gradient_checkpointing", False) and not self.unet.config.remat:
            policy = getattr(self.args, "gradient_checkpointing_policy", "full")
            self.unet = UNet2DCondition(
                dataclasses.replace(self.unet.config, remat=True, remat_policy=policy),
                dtype=self.unet.dtype,
            )

    # ------------------------------------------------------------------

    def init_dataloader(self):
        args = self.args
        ds_cls = DATASETS[self.which]
        self.train_dataset = ds_cls(args.data_path, self.tokenizer, seed=args.seed)
        if args.random_subset:
            import random as _r

            ids = _r.Random(42).sample(range(len(self.train_dataset)), args.random_subset)
            self.train_dataset.items = [self.train_dataset.items[i] for i in ids]
        self.train_dataset.resolution = args.resolution or self.spec.resolution
        proc_slice = None
        if jax.process_count() > 1:
            # pods: each host loads 1/process_count of every global batch
            from diffmining_tpu.parallel.mesh import host_local_batch_slice

            proc_slice = host_local_batch_slice(args.train_batch_size)
        self.loader = BatchIterator(
            self.train_dataset, args.train_batch_size, seed=args.seed,
            num_threads=args.dataloader_num_workers, process_slice=proc_slice,
        )

    def training_init(self):
        args = self.args
        self.init_dataloader()
        self.num_update_steps_per_epoch = max(1, math.ceil(len(self.loader) / args.gradient_accumulation_steps))
        if args.max_train_steps is None:
            args.max_train_steps = args.num_train_epochs * self.num_update_steps_per_epoch
        args.num_train_epochs = math.ceil(args.max_train_steps / self.num_update_steps_per_epoch)
        if args.logging_steps is None:
            args.logging_steps = max(1, self.num_update_steps_per_epoch // 2)
        if args.checkpointing_steps is None:
            args.checkpointing_steps = max(1, self.num_update_steps_per_epoch // 2)

        lr = args.learning_rate
        if args.scale_lr:
            lr *= args.gradient_accumulation_steps * args.train_batch_size * self.mesh.shape["dp"]
        schedule_fn = make_lr_schedule(args.lr_scheduler, lr, args.lr_warmup_steps, args.max_train_steps)
        self.optimizer = make_optimizer(
            schedule_fn, args.adam_beta1, args.adam_beta2, args.adam_weight_decay,
            args.adam_epsilon, args.max_grad_norm, args.gradient_accumulation_steps,
            use_8bit=args.use_8bit_adam,
            accum_dtype=(jnp.bfloat16 if args.gradient_accumulation_dtype == "bf16" else None),
        )
        self.builder = TrainStepBuilder(
            unet=self.unet, vae=self.vae, clip=self.clip, schedule=self.schedule,
            optimizer=self.optimizer, vae_params=self.vae_params, clip_params=self.clip_params,
            use_ema=args.use_ema, ema_max_decay=args.ema_decay, mesh=self.mesh,
            lora_rank=(args.lora_rank if args.lora else None),
            accum_steps=args.gradient_accumulation_steps,
        )
        self.state = self.builder.init_state(self.unet_params, jax.random.PRNGKey(args.seed))
        self._place_global()
        self.train_step = self.builder.build()
        self.global_step = 0   # optimizer steps (reference cars.py:286)
        self.micro_step = 0    # train_step calls == int(state.step)
        self.first_epoch = 0
        self.resume_step = 0
        self._ckptr = None  # persistent async orbax checkpointer

    def _place_global(self):
        """Multi-host: the train state and frozen towers must be GLOBAL
        (process-spanning) replicated arrays before they can enter the jitted
        step — host-local uncommitted arrays are only valid single-process.
        Init is deterministic (same seed per host), so replication is a pure
        local placement, no cross-host transfer."""
        if jax.process_count() == 1:
            return
        from diffmining_tpu.parallel.mesh import replicate_global

        self.state = replicate_global(self.mesh, self.state)
        # one replicated tree shared by the train step AND sample()/decode —
        # self.vae_params/self.clip_params must not stay host-local or
        # previews mix process-spanning UNet params with local towers
        # (ADVICE r4 medium)
        self.vae_params = self.builder.vae_params = replicate_global(self.mesh, self.builder.vae_params)
        self.clip_params = self.builder.clip_params = replicate_global(self.mesh, self.builder.clip_params)
        if self.builder.lora_base is not None:
            self.builder.lora_base = replicate_global(self.mesh, self.builder.lora_base)

    def _globalize(self, x):
        """Per-host batch slice -> global dp-sharded array (no-op shape-wise
        single-process)."""
        if jax.process_count() == 1:
            return jnp.asarray(x)
        from diffmining_tpu.parallel.mesh import globalize_batch

        return globalize_batch(self.mesh, x, local=True)

    # ------------------------------------------------------------------
    # checkpoints (orbax)
    # ------------------------------------------------------------------

    def _ckpt_dir(self, step: int) -> str:
        return join(self.args.output_dir, f"checkpoint-{step}")

    def _prune_checkpoints(self, limit):
        """Delete crashed partial writes (a checkpoint-N/ without a finalized
        state/ — orbax renames at finalize, so these are dead tmp dirs) and,
        with a limit, all but the newest `limit` COMPLETE checkpoints. Only
        called with no save in flight, so nothing here races a writer."""
        import shutil

        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # shared filesystem on pods: one pruner
        out = self.args.output_dir
        entries = sorted(
            (d for d in os.listdir(out) if re.match(r"checkpoint-\d+$", d)),
            key=lambda d: int(d.split("-")[1]),
        )
        complete = [d for d in entries if os.path.isdir(join(out, d, "state"))]
        drop = [d for d in entries if d not in complete]
        if limit:
            drop += complete[:-limit]
        for d in drop:
            shutil.rmtree(join(out, d))

    def save_checkpoint(self, step: int, wait: bool = False):
        """Asynchronous orbax save: `save()` blocks only for the device→host
        copy (safe with the donated train state — orbax's async contract) and
        the ~multi-GB serialize+write runs behind the next train steps. At
        most one save is in flight; the end-of-training call passes wait=True
        so the trainer returns with everything durable. Pruning counts only
        FINALIZED checkpoints and runs while none is in flight, so a durable
        checkpoint always survives a crash mid-write (with limit=1 the
        previous checkpoint is kept until the new one has finalized)."""
        import orbax.checkpoint as ocp

        # multi-host: orbax's own rendezvous (Gloo CPU collectives under the
        # virtual-pod tests) has a fixed ~30 s context-init window — align
        # processes first so skew from preceding host work (preview compiles,
        # figure writes) can't strand one side (see mesh.host_barrier)
        from diffmining_tpu.parallel.mesh import host_barrier

        host_barrier("ckpt")
        path = os.path.abspath(self._ckpt_dir(step))
        if self._ckptr is None:
            self._ckptr = ocp.StandardCheckpointer()
        else:
            self._ckptr.wait_until_finished()  # one in-flight save at a time
        limit = self.args.checkpoints_total_limit
        if os.path.isdir(join(path, "state")):
            # already saved at this step (end-of-training re-save)
            if wait:
                self._prune_checkpoints(limit)
            return
        self._prune_checkpoints(limit)
        self._ckptr.save(join(path, "state"), self.state)
        logger.info("Saving state to %s (async)", path)
        if wait:
            self._ckptr.wait_until_finished()
            self._prune_checkpoints(limit)

    def resume_training(self, params_only: bool = False):
        args = self.args
        if not args.resume_from_checkpoint:
            return
        if args.resume_from_checkpoint != "latest":
            path = args.resume_from_checkpoint
            if not os.path.isdir(path):
                path = join(args.output_dir, os.path.basename(path))
        else:
            # only FINALIZED checkpoints qualify — a crash mid-async-write
            # leaves checkpoint-N/ holding just an orbax tmp dir, and "latest"
            # must fall back to the newest complete one
            dirs = [
                d for d in os.listdir(args.output_dir)
                if d.startswith("checkpoint")
                and os.path.isdir(join(args.output_dir, d, "state"))
            ]
            dirs = sorted(dirs, key=lambda x: int(x.split("-")[1]))
            path = join(args.output_dir, dirs[-1]) if dirs else None
        if path is None or not os.path.isdir(path):
            logger.info("Checkpoint %r does not exist. Starting fresh.", args.resume_from_checkpoint)
            return
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            if params_only:
                # export path: raw restore, take params/ema, ignore optimizer
                # state whose structure may not match the fresh template
                raw = ckptr.restore(join(os.path.abspath(path), "state"))
                self.state = self.state.replace(
                    step=jnp.asarray(raw["step"], jnp.int32),
                    params=raw["params"],
                    ema_params=raw.get("ema_params", self.state.ema_params),
                )
            else:
                self.state = ckptr.restore(join(os.path.abspath(path), "state"), self.state)
        # state.step counts train_step CALLS (micro-steps); global_step is in
        # optimizer-step units (reference semantics). Epoch position is in
        # micro-batch units (the loader yields micro-batches). --export-only
        # goes through export_init (no dataloader), where epoch position is
        # meaningless — guard the loader access.
        self.micro_step = int(self.state.step)
        self.global_step = self.micro_step // self.args.gradient_accumulation_steps
        loader = getattr(self, "loader", None)
        batches_per_epoch = max(1, len(loader)) if loader is not None else 1
        self.first_epoch = self.micro_step // batches_per_epoch
        self.resume_step = self.micro_step % batches_per_epoch
        logger.info("Resumed from %s at optimizer step %d", path, self.global_step)

    # ------------------------------------------------------------------
    # sampling previews (reference cars.py:235-255)
    # ------------------------------------------------------------------

    def sample(self, categories=None, num_samples=None, steps=None, seed=42, guidance_scale=None):
        args = self.args
        categories = categories or self.spec.sample_categories
        num_samples = num_samples or args.num_samples_log
        steps = steps or args.num_inference_steps
        guidance_scale = guidance_scale if guidance_scale is not None else args.guidance_scale
        params = self.builder.dense_params(self.state, use_ema=args.use_ema)
        res = (self.args.resolution or self.spec.resolution) // 8
        lat = jax.random.normal(jax.random.PRNGKey(seed), (num_samples, res, res, 4), dtype=jnp.float32)
        multihost = jax.process_count() > 1
        if multihost:
            # params are global (P() replicated, _place_global); the inputs
            # must be too, or the step mixes global and host-local arrays.
            # lat/prompts are deterministic per host, so this is placement
            # only, no transfer.
            from diffmining_tpu.parallel.mesh import fetch_replicated, replicate_global

            lat = replicate_global(self.mesh, lat)
        eps_fn = lambda p, x, t, c: self.unet.apply(p, x.astype(self.dtype), t, c.astype(self.dtype))
        logs = {}
        for c in categories:
            prompts = [self.spec.sample_prompt.format(c=c)] * num_samples
            neg = [self.spec.negative_prompt] * num_samples
            tok = jnp.asarray(self.tokenizer(prompts))
            ntok = jnp.asarray(self.tokenizer(neg))
            if multihost:
                tok, ntok = replicate_global(self.mesh, (tok, ntok))
            ctx = self.clip.apply(self.clip_params, tok)
            nctx = self.clip.apply(self.clip_params, ntok)
            z = sample_ddim(
                eps_fn, params, self.schedule, lat.astype(self.dtype), ctx, nctx,
                num_inference_steps=steps, guidance_scale=guidance_scale,
            )
            imgs = self.vae.apply(self.vae_params, z, method=AutoencoderKL.decode)
            imgs = fetch_replicated(imgs) if multihost else np.asarray(imgs)
            logs[c] = [array_to_image(np.asarray(imgs[i], dtype=np.float32)) for i in range(num_samples)]
        return logs

    def save_logs(self, logs):
        plot_dir = join(self.args.output_dir, "plots", str(self.global_step))
        os.makedirs(plot_dir, exist_ok=True)
        for k, v in logs.items():
            concat_images_width(v).save(join(plot_dir, f"{k}.png"))

    # ------------------------------------------------------------------

    def end_training(self):
        args = self.args
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()
            self._ckptr.close()
            self._ckptr = None
        export_dir = args.export_dir or join(args.output_dir, "export")
        params = self.builder.dense_params(self.state, use_ema=args.use_ema)
        if jax.process_count() > 1 and jax.process_index() != 0:
            return export_dir  # params are replicated; process 0 writes
        save_pipeline_dir(
            export_dir,
            self.unet.config, jax.device_get(params),
            self.vae.config, jax.device_get(self.vae_params),
            self.clip.config, jax.device_get(self.clip_params),
            self.schedule,
            tokenizer_src_dir=(join(args.base_name_or_path, "tokenizer") if os.path.isdir(str(args.base_name_or_path)) else None),
        )
        logger.info("Exported pipeline to %s", export_dir)
        return export_dir

    def export_init(self):
        """Optimizer-only init for --export-only: skips the dataloader
        (the reference's export fast path, places.py:136-189)."""
        args = self.args
        self.num_update_steps_per_epoch = 1
        self.optimizer = make_optimizer(make_lr_schedule("constant", args.learning_rate, 0))
        self.builder = TrainStepBuilder(
            unet=self.unet, vae=self.vae, clip=self.clip, schedule=self.schedule,
            optimizer=self.optimizer, vae_params=self.vae_params, clip_params=self.clip_params,
            use_ema=args.use_ema, ema_max_decay=args.ema_decay, mesh=self.mesh,
            lora_rank=(args.lora_rank if args.lora else None),
        )
        self.state = self.builder.init_state(self.unet_params, jax.random.PRNGKey(args.seed))
        self._place_global()
        self.global_step = self.first_epoch = self.resume_step = 0

    def train(self):
        args = self.args
        os.makedirs(args.output_dir, exist_ok=True)
        if args.export_only:
            self.export_init()
            self.resume_training(params_only=True)
            return self.end_training()
        self.training_init()
        self.resume_training()

        from diffmining_tpu.utils.observability import MetricsLogger, StepTimer

        rng = jax.random.PRNGKey(args.seed)
        # device-side scalars: fetching the loss every step is a host sync
        # (~200 ms through the relay vs a ~400 ms full step — up to ~33%
        # throughput); keep the async dispatch pipeline full and fetch once
        # per logging window. The reference gathers the loss every step
        # (cars.py:290) — we deliberately don't.
        losses: List[jax.Array] = []
        # host-side writes (metrics, previews) happen on process 0 only; the
        # loss scalar is replicated so every process computes the same mean
        is_proc0 = jax.process_index() == 0
        metrics = MetricsLogger(
            join(args.output_dir, args.logging_dir, "metrics.jsonl"),
            report_to=getattr(args, "report_to", ""),
        ) if is_proc0 else None
        timer = StepTimer()
        done = False
        # global_step counts OPTIMIZER steps (accumulation-window boundaries),
        # like the reference's accelerate loop (global_step += 1 only under
        # sync_gradients, cars.py:286) — max_train_steps / checkpointing_steps
        # / logging_steps are all in optimizer-step units. micro_step counts
        # train_step calls (== state.step) and drives epoch resume.
        accum = args.gradient_accumulation_steps
        for epoch in range(self.first_epoch, args.num_train_epochs):
            for step, batch in enumerate(self.loader.epoch(epoch)):
                if epoch == self.first_epoch and step < self.resume_step:
                    continue
                self.state, loss = self.train_step(
                    self.state, self._globalize(batch["image"]), self._globalize(batch["tokenized"]), rng
                )
                self.micro_step += 1
                losses.append(loss)  # device scalar — no host fetch here
                del losses[:-50]
                timer.tick()
                if self.micro_step % accum != 0:
                    continue  # mid-window micro-step: no optimizer update
                self.global_step += 1
                if self.global_step % args.checkpointing_steps == 0:
                    self.save_checkpoint(self.global_step)
                if self.global_step % args.logging_steps == 0:
                    mean_loss = float(jnp.mean(jnp.stack(losses)))  # ONE sync per window
                    logger.info("step %d loss %.4f", self.global_step, mean_loss)
                    if metrics is not None:
                        metrics.log(self.global_step, train_loss=mean_loss, epoch=epoch,
                                    steps_per_sec=timer.steps_per_sec())
                    if args.log_previews:
                        # sample() is an SPMD computation over the (possibly
                        # multi-process) mesh — every process must join; only
                        # process 0 writes the grids
                        logs = self.sample()
                        if is_proc0:
                            self.save_logs(logs)
                if self.global_step >= args.max_train_steps:
                    done = True
                    break
            if done:
                break
        if metrics is not None:
            metrics.close()
        if args.log_previews:
            logs = self.sample()
            if is_proc0:
                self.save_logs(logs)
        self.save_checkpoint(self.global_step, wait=True)
        return self.end_training()
