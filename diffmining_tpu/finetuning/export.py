"""export_model: turn a training checkpoint dir into a pipeline dir on demand
(reference: typicality/compute.py:343-362 re-invokes the matching trainer as a
subprocess with --export-only; here it is an in-process call)."""
from __future__ import annotations

import os
from os.path import join


def export_model(which: str, model_path: str, base_name_or_path: str | None = None) -> str:
    """model_path points at `{output_dir}/checkpoint-{N}`; writes
    `{model_path}-export` as a diffusers-layout pipeline dir and returns it."""
    export_dir = model_path.rstrip("/") + "-export"
    if os.path.isdir(export_dir) and os.path.isfile(join(export_dir, "model_index.json")):
        return export_dir
    from diffmining_tpu.finetuning.args import parse_args
    from diffmining_tpu.finetuning.base import BaseTrainer

    output_dir, checkpoint = os.path.split(model_path.rstrip("/"))
    argv = [
        "--output_dir", output_dir,
        "--resume_from_checkpoint", checkpoint,
        "--export-only",
        "--export-dir", export_dir,
        "--train_batch_size", "1",
    ]
    if base_name_or_path:
        argv += ["--base_name_or_path", base_name_or_path]
    args = parse_args(argv)
    trainer = BaseTrainer(which, args)
    trainer.train()  # export_only short-circuits to end_training after resume
    return export_dir
