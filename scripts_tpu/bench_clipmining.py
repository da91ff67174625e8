"""CLIP-baseline mining throughput microbench (TPU).

The reference quotes ~30 min per country for the full rank+cluster pipeline
on 32 CPUs (clipmining/README.md:15). The pipeline is dominated by the
vision-tower encodes (1 forward per image upstream); this times our batched
tower at the production ViT-L geometry and reports images/s plus the
projected per-country encode time (1k gt images/country, the mining k).

    python scripts_tpu/bench_clipmining.py [--batch 8] [--px 336] [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--px", type=int, default=336, help="input size (StreetCLIP native)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tiny", action="store_true", help="tiny tower (smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffmining_tpu.models.clip import CLIPVisionModel, TINY_CLIP_VISION, CLIPVisionConfig

    if args.tiny:
        vision = CLIPVisionModel(TINY_CLIP_VISION)
        args.px = 64
    else:
        # ViT-L/14 geometry (StreetCLIP / clip-vit-large-patch14)
        vision = CLIPVisionModel(CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_layers=24,
            num_heads=16, image_size=args.px, patch_size=14,
        ))
    rng = jax.random.PRNGKey(0)
    params = vision.init(rng, jnp.zeros((1, args.px, args.px, 3)))

    # in-jit fori_loop + one scalar fetch (BENCH_NOTES methodology — host
    # syncs through the relay are ~200 ms and block_until_ready is a no-op)
    @jax.jit
    def loop(p, x):
        def body(i, x):
            _, tokens = vision.apply(p, x)
            feedback = tokens[:, 0, 0].astype(x.dtype)
            return x * 0.999 + feedback[:, None, None, None] * 1e-6

        x = jax.lax.fori_loop(0, args.iters, body, x)
        return jnp.float32(x[0, 0, 0, 0])

    x = jnp.asarray(np.random.RandomState(0).rand(args.batch, args.px, args.px, 3), jnp.float32)
    t0 = time.perf_counter()
    _ = float(loop(params, x))
    print(f"first call (incl. compile): {time.perf_counter() - t0:.1f} s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(params, x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / args.iters
    ips = args.batch / dt
    print(f"B={args.batch} {args.px}px ViT-L: {dt*1e3:.1f} ms/batch = {ips:.1f} images/s")
    print(f"projected encode time for 1k images/country: {1000/ips:.1f} s "
          f"(reference full pipeline: ~30 min/country on 32 CPUs)")


if __name__ == "__main__":
    main()
