"""Finetuning CLI for the 'places' domain (mirrors the reference's per-domain
trainer entry point, diffmining/finetuning/places.py; all logic lives in
base.py + datasets.py — run: python -m diffmining_tpu.finetuning.places ...)."""
from diffmining_tpu.finetuning.args import parse_args
from diffmining_tpu.finetuning.base import BaseTrainer


def main(argv=None):
    return BaseTrainer("places", parse_args(argv)).train()


if __name__ == "__main__":
    main()
