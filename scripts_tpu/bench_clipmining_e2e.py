"""CLIP-baseline mining END-TO-END bench (VERDICT r4 #5).

The reference quotes ~30 min per country for the full rank+cluster pipeline
(reference clipmining/README.md:15, 32 CPUs). The round-4 microbench timed
only the vision tower; this times the WHOLE per-country pipeline on a
synthetic 1k-image country at the production ViT-L/336 geometry with random
weights (identical compute cost to real weights): PIL decode+resize, batched
tower encode, score-map pooling, top-k suppression, box embeds, k-means(32)
clustering, patch crops + figure grid — wall-clock per phase.

    python scripts_tpu/bench_clipmining_e2e.py [--images 1000] [--batch 8]
        [--px 336] [--host-scoring] [--keep]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, px: int) -> str:
    """Synthetic geo-layout country: n JPEGs at (px+32)² so the loader's
    resize+crop path does real work (real street-view inputs are not
    pre-sized)."""
    import numpy as np
    from PIL import Image

    data = os.path.join(root, "dataset")
    os.makedirs(os.path.join(data, "France"), exist_ok=True)
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (px + 32, px + 32, 3), dtype=np.uint8)
    for i in range(n):
        # cheap per-image variation (roll) — full randint per image would make
        # dataset GENERATION the bottleneck of the bench setup
        arr = np.roll(base, i * 7, axis=1)
        Image.fromarray(arr).save(os.path.join(data, "France", f"gt--France__{i}.jpg"), quality=90)
    return data


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--px", type=int, default=336)
    ap.add_argument("--tiny", action="store_true", help="tiny tower smoke (CPU)")
    ap.add_argument("--host-scoring", action="store_true", help="A/B: legacy host score path")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        # smoke must not touch (or queue behind) the TPU relay
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffmining_tpu.baselines.clipmining import CLIPRankCluster
    from diffmining_tpu.models.clip import (
        CLIPTextModelWithProjection,
        CLIPVisionModel,
        CLIPVisionConfig,
        TINY_CLIP_TEXT,
        TINY_CLIP_VISION,
    )
    from diffmining_tpu.models.tokenizer import tiny_tokenizer

    root = tempfile.mkdtemp(prefix="clipmine_e2e_")
    t0 = time.perf_counter()
    data = make_dataset(root, args.images, 64 if args.tiny else args.px)
    print(f"dataset: {args.images} images in {time.perf_counter() - t0:.1f} s", flush=True)

    if args.tiny:
        vision, px = CLIPVisionModel(TINY_CLIP_VISION), 64
        text = CLIPTextModelWithProjection(TINY_CLIP_TEXT, projection_dim=16)
    else:
        px = args.px
        # ViT-L/14 geometry (StreetCLIP / clip-vit-large-patch14-336)
        vision = CLIPVisionModel(CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_layers=24,
            num_heads=16, image_size=px, patch_size=14, projection_dim=768,
        ))
        from diffmining_tpu.models.clip import CLIPTextConfig

        text = CLIPTextModelWithProjection(
            CLIPTextConfig(hidden_size=768, intermediate_size=3072,
                           num_layers=12, num_heads=12),
            projection_dim=768,
        )
    rng = jax.random.PRNGKey(0)
    vp = vision.init(rng, jnp.zeros((1, px, px, 3)))
    tp = text.init(rng, jnp.zeros((1, 77), jnp.int32))

    rc = CLIPRankCluster(
        data, os.path.join(root, "cache"), "diff",
        vision=vision, vision_params=vp, text=text, text_params=tp,
        tokenizer=tiny_tokenizer(text.config.vocab_size), crop=px,
        batch_images=args.batch, host_scoring=args.host_scoring,
    )

    t0 = time.perf_counter()
    df, embeds = rc.rank("France", k_per_image=5, kx=64, ky=64)
    t_rank = time.perf_counter() - t0
    print(f"rank ({'host' if args.host_scoring else 'device'} scoring): "
          f"{len(df)} patches in {t_rank:.1f} s "
          f"({args.images / t_rank:.2f} img/s)", flush=True)

    t0 = time.perf_counter()
    results = rc.clustering(k_per_image=5, k=1000, num_clusters=32, hard_limit=6)
    t_cluster = time.perf_counter() - t0  # rank() is cached → cluster-only
    n_cl = len(results["France"])
    print(f"cluster+figures: {n_cl} clusters in {t_cluster:.1f} s", flush=True)

    total = t_rank + t_cluster
    print(f"E2E per country ({args.images} images): {total:.1f} s "
          f"= {total / 60:.2f} min (reference: ~30 min/country on 32 CPUs "
          f"→ {30 * 60 / total:.1f}x)", flush=True)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    else:
        print(f"kept: {root}")


if __name__ == "__main__":
    main()
