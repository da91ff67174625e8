"""Finetuning CLI for the 'xray' domain (mirrors the reference's per-domain
trainer entry point, diffmining/finetuning/xray.py; all logic lives in
base.py + datasets.py — run: python -m diffmining_tpu.finetuning.xray ...)."""
from diffmining_tpu.finetuning.args import parse_args
from diffmining_tpu.finetuning.base import BaseTrainer


def main(argv=None):
    return BaseTrainer("xray", parse_args(argv)).train()


if __name__ == "__main__":
    main()
