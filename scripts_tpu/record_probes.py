"""Record torch/diffusers activation probes for `verify_checkpoint --probes`.

Run this on a machine that has diffusers installed (this zero-egress image
does not) against the SAME pipeline directory you will verify:

    python scripts_tpu/record_probes.py <pipeline_dir> probes.npz \
        [--image img.jpg] [--prompt "A car at the 1960s."] [--t 261]

Contract (all fp32, torch NCHW squeezed to single-sample):
    image        [H,W,3] in [-1,1] (the probe input; synthesized if --image absent)
    prompt, t    the probe conditioning
    text_hidden  [77, D]    CLIPTextModel last_hidden_state
    vae_mean     [4, h, w]  AutoencoderKL posterior mean (latent_dist.mean)
    unet_eps     [4, h, w]  unet(add_noise(mean*sf, 0, t), t, text_hidden)
                            — zero-noise latents make the probe deterministic.
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pipeline_dir")
    ap.add_argument("out")
    ap.add_argument("--image", default=None)
    ap.add_argument("--prompt", default="A car at the 1960s.")
    ap.add_argument("--t", type=int, default=261)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args(argv)

    try:
        import torch
        from diffusers import AutoencoderKL, DDPMScheduler, UNet2DConditionModel
        from transformers import CLIPTextModel, CLIPTokenizer
    except ImportError as e:
        raise SystemExit(f"record_probes needs torch+diffusers+transformers: {e}")

    if args.image:
        from PIL import Image

        pil = Image.open(args.image).convert("RGB").resize((args.size, args.size))
        image = np.asarray(pil, np.float32) / 127.5 - 1.0
    else:
        image = np.tanh(np.random.RandomState(0).randn(args.size, args.size, 3)).astype(np.float32)

    unet = UNet2DConditionModel.from_pretrained(args.pipeline_dir, subfolder="unet").eval()
    vae = AutoencoderKL.from_pretrained(args.pipeline_dir, subfolder="vae").eval()
    clip = CLIPTextModel.from_pretrained(args.pipeline_dir, subfolder="text_encoder").eval()
    tok = CLIPTokenizer.from_pretrained(args.pipeline_dir, subfolder="tokenizer")
    sched = DDPMScheduler.from_pretrained(args.pipeline_dir, subfolder="scheduler")

    with torch.no_grad():
        ids = tok([args.prompt], padding="max_length", max_length=77, truncation=True, return_tensors="pt").input_ids
        text_hidden = clip(ids).last_hidden_state
        x = torch.from_numpy(image.transpose(2, 0, 1))[None]
        vae_mean = vae.encode(x).latent_dist.mean
        sf = vae.config.scaling_factor
        t = torch.tensor([args.t])
        noisy = sched.add_noise(vae_mean * sf, torch.zeros_like(vae_mean), t)
        eps = unet(noisy, t, encoder_hidden_states=text_hidden).sample

    np.savez(
        args.out,
        image=image,
        prompt=np.asarray(args.prompt),
        t=np.asarray(args.t),
        text_hidden=text_hidden[0].numpy().astype(np.float32),
        vae_mean=vae_mean[0].numpy().astype(np.float32),
        unet_eps=eps[0].numpy().astype(np.float32),
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
