"""Finetuning CLI for the 'ftt' domain (mirrors the reference's per-domain
trainer entry point, diffmining/finetuning/ftt.py; all logic lives in
base.py + datasets.py — run: python -m diffmining_tpu.finetuning.ftt ...)."""
from diffmining_tpu.finetuning.args import parse_args
from diffmining_tpu.finetuning.base import BaseTrainer


def main(argv=None):
    return BaseTrainer("ftt", parse_args(argv)).train()


if __name__ == "__main__":
    main()
