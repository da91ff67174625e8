"""Convert HF diffusers checkpoints into verified local pipeline dirs.

Replacement for the reference's hub fetchers (reference: scripts/
download-models.py + download-cardb.py use huggingface_hub snapshot_download).
This environment is zero-egress, so instead of downloading we validate +
convert an already-present diffusers checkpoint directory:

    python scripts_tpu/convert_models.py /path/to/stable-diffusion-v1-5 out/sd-v1-5

The conversion is a load (utils/weights.load_pipeline_dir: safetensors ->
flax pytrees, NHWC/transposed) followed by a re-export
(utils/export.save_pipeline_dir), which round-trips every tensor and fails
loudly on any unmapped parameter name — making this the checkpoint-integrity
check as well.
"""
from __future__ import annotations

import sys


def main(src: str, dst: str) -> None:
    import jax

    from diffmining_tpu.utils.export import save_pipeline_dir
    from diffmining_tpu.utils.weights import load_pipeline_dir

    p = load_pipeline_dir(src)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(p["unet"]["params"]))
    print(f"unet: {n_params/1e6:.1f}M params; vae + text encoder loaded")
    save_pipeline_dir(
        dst,
        p["unet"]["config"], p["unet"]["params"],
        p["vae"]["config"], p["vae"]["params"],
        p["text_encoder"]["config"], p["text_encoder"]["params"],
        p["schedule"],
        tokenizer_src_dir=p["tokenizer_dir"],
    )
    print(f"wrote pipeline to {dst}; validating (structure/forward)...")
    from diffmining_tpu.utils.verify_checkpoint import main as verify

    rc = verify([dst])
    if rc != 0:
        raise SystemExit(rc)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])
