"""DIFT featurizer throughput on TPU at the production config.

The mining stage's hot path (reference cluster.py:243-310 + dift.py:213-232):
per patch, one 8-noise-ensemble tapped-UNet forward of the whole image, then
a feature-space crop. Here the whole ensemble is ONE jitted call and the
per-image feature map is LRU-shared across the ~5 patches per image
(typicality/dift.py). Measures:
  * ensembles/s — distinct images (cache miss every call)
  * patches/s   — the product pattern (5 patches per image, 1 miss + 4 hits)

    python scripts_tpu/bench_dift.py [--px 512] [--images 8] [--per_image 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)

import jax

try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--per_image", type=int, default=5, help="patches per image (reference k_per_image)")
    ap.add_argument("--t", type=int, default=161)
    args = ap.parse_args()

    from diffmining_tpu.typicality.compute import SD
    from diffmining_tpu.typicality.dift import SDFeaturizer

    print(f"backend={jax.default_backend()} px={args.px}")
    sd = SD.init_random("cars", ["1930"], image_size=args.px)
    dift = SDFeaturizer(sd, image_cache_size=max(8, args.images))

    rng = np.random.RandomState(0)
    imgs = [(rng.rand(args.px, args.px, 3).astype(np.float32) * 2 - 1) for _ in range(args.images)]
    box = (args.px // 4, args.px // 4, args.px // 4 + 64, args.px // 4 + 64)

    # compile + warm
    _ = dift.patch_feature(imgs[0], "A car at the 1930's.", box, t=args.t, uid=0)

    # distinct-image ensembles (cache miss each)
    t0 = time.perf_counter()
    for i, im in enumerate(imgs[1:], start=1):
        _ = dift.patch_feature(im, "A car at the 1930's.", box, t=args.t, uid=i)
    dt = time.perf_counter() - t0
    n = len(imgs) - 1
    print(f"ensembles/s (cache-miss): {n / dt:.2f}  ({dt / n * 1e3:.1f} ms/image ensemble)")

    # product pattern: per_image patches share one map (fresh uids so each
    # image pays exactly 1 ensemble miss + per_image-1 crop hits)
    t0 = time.perf_counter()
    done = 0
    for i, im in enumerate(imgs):
        for j in range(args.per_image):
            b = (j * 8, j * 8, j * 8 + 64, j * 8 + 64)
            _ = dift.patch_feature(im, "A car at the 1930's.", b, t=args.t, uid=args.images + i)
            done += 1
    dt = time.perf_counter() - t0
    print(f"patches/s (product, {args.per_image}/image): {done / dt:.2f}")
    print(f"patches/hr: {done / dt * 3600:,.0f}")


if __name__ == "__main__":
    main()
