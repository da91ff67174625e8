"""Ahead-of-time compile warmup for a dataset's latent-shape buckets.

Free-aspect datasets (cars: short side 256, free long side) hit one XLA
compile per distinct latent shape, and compiles through this host's remote
tunnel cost minutes each. This tool scans the dataset, derives the distinct
post-rescale (bucketed) shapes, and runs one dummy sweep per shape so the
persistent compile cache is hot before the real submission runs.

    python scripts_tpu/warmup_buckets.py --which cars --dataset_path dataset/cars/train \
        --model_path models/cars/export --bucket_size 64 --N 100
"""
from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", required=True, choices=["geo", "ftt", "cars", "places"])
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--model_path", default=None, help="pipeline dir; tiny random stack if omitted")
    ap.add_argument("--bucket_size", type=int, default=64)
    ap.add_argument("--N", type=int, default=100)
    ap.add_argument("--batch_images", type=int, default=4)
    ap.add_argument("--t_min", type=float, default=0.1)
    ap.add_argument("--t_max", type=float, default=0.7)
    ap.add_argument(
        "--native_res", action="store_true",
        help="derive buckets at original resolution (match `typicality --native_res`)",
    )
    ap.add_argument(
        "--pnp", action="store_true",
        help="also warm the PnP programs per bucket (B=S inversion + "
        "reconstruction + the B-target translation scan) — they cost "
        "130 s+ of compile each through the remote tunnel",
    )
    ap.add_argument("--pnp_inversion_steps", type=int, default=999)
    ap.add_argument("--pnp_n_timesteps", type=int, default=50)
    ap.add_argument("--pnp_targets", type=int, default=10)
    ap.add_argument("--pnp_batch_sources", type=int, default=4)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from diffmining_tpu.typicality.compute import SD, Typicality
    from diffmining_tpu.typicality.engine import TypicalityEngine
    from diffmining_tpu.utils.images import rescale_for_domain

    typ = Typicality(args.which, None, args.dataset_path, "/tmp/warmup-unused", sd=None)
    shapes = collections.Counter()
    for c in typ.categories():
        for path in typ.get_seeds_(c):
            with Image.open(path) as img:
                img = rescale_for_domain(img, args.which, args.bucket_size, native=args.native_res)
                shapes[(img.height, img.width)] += 1
    def iter_plain_images(root):
        for sub in sorted(os.listdir(root)):
            d = os.path.join(root, sub)
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.lower().endswith((".jpg", ".jpeg", ".png")):
                    yield os.path.join(d, f)

    if not shapes:
        # raw {category}/*.jpg tree (e.g. the PnP --base_path) — no gt--
        # protocol for the domain scanner to find; bucket every image file
        print("no protocol-matching files; falling back to a plain directory scan")
        for p in iter_plain_images(args.dataset_path):
            with Image.open(p) as img:
                img = rescale_for_domain(
                    img, args.which, args.bucket_size, native=args.native_res
                )
                shapes[(img.height, img.width)] += 1
    print(f"{sum(shapes.values())} images in {len(shapes)} shape bucket(s):")
    for (h, w), n in shapes.most_common():
        print(f"  {h}x{w}: {n}")

    if args.model_path:
        sd = SD.from_pipeline_dir(args.which, args.model_path, [])
    else:
        sd = SD.init_tiny(args.which, [])
    engine = TypicalityEngine(
        unet=sd.unet, unet_params=sd.unet_params, schedule=sd.schedule,
        n_samples=args.N, t_min=args.t_min, t_max=args.t_max, dtype=sd.dtype,
    )
    # latent downsample factor from the VAE depth
    f = 2 ** (len(sd.vae.config.block_out_channels) - 1)
    D = sd.unet.config.cross_attention_dim
    for (h, w), _ in shapes.most_common():
        lat = jnp.zeros((args.batch_images, h // f, w // f, 4), jnp.float32)
        ctx = jnp.zeros((args.batch_images, 2, 77, D), jnp.float32)
        out = engine.compute(lat, ctx, list(range(args.batch_images)))
        _ = float(jnp.sum(out[:, 0, 0, 0, 0, 0].astype(jnp.float32)))
        print(f"  warmed {h}x{w}")

    if args.pnp:
        from diffmining_tpu.applications.pnp import PNP

        # PnP feeds RAW image sizes (no domain rescale, no 64-bucketing), so
        # derive its own shape census; a run over n same-shape pending images
        # executes groups of S = --batch_sources plus one n%S tail group, and
        # each group size is its own compiled program — warm both
        raw = collections.Counter()
        for p in iter_plain_images(args.dataset_path):
            with Image.open(p) as img:
                raw[(img.height, img.width)] += 1
        pnp = PNP(sd, inversion_steps=args.pnp_inversion_steps,
                  n_timesteps=args.pnp_n_timesteps)
        S = max(args.pnp_batch_sources, 1)
        for (h, w), n in raw.most_common():
            warm = {S, n % S} - {0} if n >= S else {n}
            for s in sorted(warm):
                pnp.invert(np.zeros((s, h, w, 3), np.float32))
                pnp.reconstruct_many()
                pnp.generate(["warmup"] * args.pnp_targets)
                print(f"  warmed pnp {h}x{w} S={s}")


if __name__ == "__main__":
    main()
