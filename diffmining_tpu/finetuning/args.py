"""Training flag system — same surface as the reference's parser_base
(reference: diffmining/finetuning/args.py:4-254, ~45 flags), with
accelerate/CUDA-specific flags replaced by their TPU equivalents (mesh shape,
bf16 default) and kept as accepted-but-inert aliases where scripts pass them.
"""
from __future__ import annotations

import argparse
import os


def parser_base() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SD finetuning (TPU)")
    # model / data
    p.add_argument("--base_name_or_path", type=str, default="runwayml/stable-diffusion-v1-5",
                   help="pipeline dir with converted SD weights (diffusers layout)")
    p.add_argument("--clip_path", type=str, default=None,
                   help="override text-encoder dir (e.g. StreetCLIP for geo)")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="sd-model-finetuned")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=256)
    # training
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_accumulation_dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="grad accumulator storage dtype. bf16 halves the "
                        "3.4 GB fp32 UNet accumulator — needed for accum>1 "
                        "WITHOUT --gradient_checkpointing on one 16 GB chip "
                        "(BENCH_NOTES round-5 stage E)")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="jax.checkpoint (remat) on UNet blocks. Only needed "
                        "when activations OOM: B=4 512px fits WITHOUT it on "
                        "one v5e chip and runs +15.6%% faster (BENCH_NOTES "
                        "round-5 stage A); B>=8 single-chip requires it")
    p.add_argument("--gradient_checkpointing_policy", type=str, default="full",
                   choices=["full", "attn", "dots"],
                   help="what to remat: full=every block; attn=transformer "
                        "blocks only (conv activations saved); dots=both "
                        "under the dots-saveable policy (models/unet.py)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale lr by dp size × grad accumulation × batch (reference base.py:209)")
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   choices=["constant", "linear", "cosine", "constant_with_warmup",
                            "cosine_with_restarts", "polynomial"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--non_ema_revision", type=str, default=None)
    # optimizer (reference args.py:155-158)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-08)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="int8 optimizer-moment storage (ops/optim8bit; ~4x less optimizer HBM)")
    # precision / hardware
    p.add_argument("--mixed_precision", type=str, default="bf16", choices=["no", "fp16", "bf16"])
    p.add_argument("--allow_tf32", action="store_true", help="inert on TPU (MXU is bf16-native)")
    p.add_argument("--xformers", action="store_true", help="inert: attention kernels are built in")
    p.add_argument("--enable_xformers_memory_efficient_attention", action="store_true")
    p.add_argument("--local_rank", type=int, default=-1)
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--mesh_dp", type=int, default=None, help="data-parallel mesh size (default: all devices)")
    p.add_argument("--mesh_fsdp", type=int, default=1)
    # multi-host (TPU pods) — replaces the reference's accelerate/NCCL
    # multi-node process group (reference base.py:86-96, args.py LOCAL_RANK):
    # jax.distributed.initialize per host, mesh over GLOBAL devices, per-host
    # batch slices in BatchIterator.
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize before building the "
                   "mesh (TPU pods auto-discover the topology; CPU/GPU "
                   "clusters pass the coordinator flags)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (implies --distributed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # lora
    p.add_argument("--lora", action="store_true")
    p.add_argument("--lora_rank", type=int, default=4)
    # checkpoint / logging
    p.add_argument("--checkpointing_steps", type=int, default=None)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--logging_steps", type=int, default=None)
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--tracker_project_name", type=str, default="sd-finetune")
    # export
    p.add_argument("--export-only", dest="export_only", action="store_true")
    p.add_argument("--export-dir", dest="export_dir", type=str, default=None)
    # reference-CLI compatibility: flags the reference declares that are DEAD
    # in its own trainers (pretrained_model_name_or_path/pretrained/revision/
    # noise_offset/noise_steps/max_train_samples/val_batch_size/
    # geoguessr_loss_factor — declared in reference args.py but never read;
    # probabilistic_dataloader is accepted by G3/G3r and then unused) or
    # hub-only (push_to_hub/hub_model_id/hub_token — no egress here). Accepted
    # so reference launch scripts parse unchanged; all inert.
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--pretrained", action="store_true")
    p.add_argument("--revision", type=str, default=None)
    p.add_argument("--tag", type=str, default=None)
    p.add_argument("--noise_offset", type=float, default=0.0)
    p.add_argument("--noise_steps", type=int, default=None)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--val_batch_size", type=int, default=None)
    p.add_argument("--geoguessr_loss_factor", type=float, default=None)
    p.add_argument("--probabilistic_dataloader", action="store_true")
    p.add_argument("--push_to_hub", action="store_true",
                   help="inert: no hub egress — use the exported pipeline dir")
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--hub_token", type=str, default=None)
    # misc parity flags
    p.add_argument("--random_subset", type=int, default=None)
    p.add_argument("--num_samples_log", type=int, default=5)
    p.add_argument("--log_previews", action="store_true",
                   help="render DDIM sample grids at logging steps (reference cars.py:318-328)")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--num_inference_steps", type=int, default=50)
    return p


def parse_args(argv=None):
    args = parser_base().parse_args(argv)
    if args.distributed or args.coordinator_address is not None:
        # must run before any device/mesh use so jax.devices() is GLOBAL
        from diffmining_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    env_local_rank = int(os.environ.get("LOCAL_RANK", -1))
    if env_local_rank != -1 and env_local_rank != args.local_rank:
        args.local_rank = env_local_rank
    if args.non_ema_revision is not None:
        args.use_ema = True
    return args
