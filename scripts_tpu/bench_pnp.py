"""PnP translation cost on TPU at the production config.

Measures, at full SD-v1.5 512px scale with random weights (costs are
weight-independent):
  * 999-step DDIM inversion (one lax.scan) — reference pnp.py:157-180 runs
    999 sequential UNet calls per image on an A100-80GB.
  * 50-step guided translation of a 10-country batch (ONE dispatch:
    source-tap + CFG pass + DDIM update fused in a scan, applications/pnp.py)
    — the reference runs 50 host steps of a (1+2*10)-image batch.

    python scripts_tpu/bench_pnp.py [--px 512] [--targets 10] [--inv_steps 999]
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
    ap.add_argument("--targets", type=int, default=10)
    ap.add_argument("--inv_steps", type=int, default=999)
    ap.add_argument("--n_timesteps", type=int, default=50)
    ap.add_argument(
        "--batch_sources", type=int, default=4,
        help="also time a B=S batched inversion+reconstruct (the product's "
        "--batch_sources path); values < 2 skip it (S=1 equals the unbatched "
        "timing above)",
    )
    args = ap.parse_args()

    from diffmining_tpu.applications.pnp import PNP
    from diffmining_tpu.typicality.compute import SD

    print(f"backend={jax.default_backend()} px={args.px} targets={args.targets}")
    sd = SD.init_random("geo", ["France"], image_size=args.px)
    pnp = PNP(sd, inversion_steps=args.inv_steps, n_timesteps=args.n_timesteps)

    rng = np.random.RandomState(0)
    img = (rng.rand(args.px, args.px, 3).astype(np.float32) * 2 - 1)

    import jax.numpy as jnp

    def sync():  # block_until_ready is a no-op through the relay: fetch a scalar
        return float(jnp.sum(pnp._source_latent.astype(jnp.float32)))

    t0 = time.perf_counter()
    pnp.invert(img)  # includes the one-time compile
    sync()
    c0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    pnp.invert(img)
    sync()
    inv_s = time.perf_counter() - t0
    print(f"inversion {args.inv_steps} steps: {inv_s:.2f} s (first incl. compile {c0:.1f} s)")

    prompts = [f"country {i}" for i in range(args.targets)]
    t0 = time.perf_counter()
    imgs = pnp.generate(prompts)
    c1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    imgs = pnp.generate(prompts)
    gen_s = time.perf_counter() - t0
    print(
        f"translate {args.targets} targets x {args.n_timesteps} steps: {gen_s:.2f} s "
        f"({gen_s / args.targets * 1e3:.0f} ms/target; first incl. compile {c1:.1f} s)"
    )
    total = inv_s + gen_s
    print(f"per source image (invert + {args.targets} translations): {total:.2f} s")

    if args.batch_sources > 1:
        S = args.batch_sources
        imgs_b = (rng.rand(S, args.px, args.px, 3).astype(np.float32) * 2 - 1)
        t0 = time.perf_counter()
        pnp.invert(imgs_b)  # new B=S program: includes compile
        sync()
        cb = time.perf_counter() - t0
        t0 = time.perf_counter()
        pnp.invert(imgs_b)
        sync()
        inv_b = time.perf_counter() - t0
        print(
            f"batched inversion S={S}: {inv_b:.2f} s = {inv_b / S:.2f} s/source "
            f"(vs {inv_s:.2f} unbatched; first incl. compile {cb:.1f} s)"
        )
        total_b = inv_b / S + gen_s
        print(f"per source at --batch_sources {S}: {total_b:.2f} s")


if __name__ == "__main__":
    main()
