"""Thin re-export: the hand-written torch transcription oracle now lives in
the package (diffmining_tpu/utils/torch_oracle.py) so the verify_checkpoint
CLI's --torch_oracle stage can drive it too; tests keep importing from here."""
from diffmining_tpu.utils.torch_oracle import *  # noqa: F401,F403
from diffmining_tpu.utils.torch_oracle import (  # noqa: F401
    AutoencoderKLRef,
    UNet2DConditionRef,
    timestep_embedding,
)
