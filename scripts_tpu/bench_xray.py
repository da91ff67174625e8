"""X-ray batched-sweep throughput on TPU (VERDICT r3 weak #4 product row).

Measures the exact per-image work of XRayTypicality.pixel_maps (applications/
xray.py:151-174: VAE encode + N=100 paired cond/null sweep at the X-ray's
NATIVE resolution + host pixel-map conversion) on synthetic images, A/B'ing
the sweep batching:

    python scripts_tpu/bench_xray.py [--px 1024] [--images 8] \
        [--configs 1x10 4x2 4x1]      # batch_images x chunk

The reference loops one image at a time (xray/compute.py:296-311); the round-3
`--batch_images` landed with no TPU number — this records it, and probes the
chunk (per-scan-step UNet batch = batch*chunk*2; 16 was the measured 512px
optimum, BENCH_NOTES).
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
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=1024, help="X-ray native resolution")
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--n_samples", type=int, default=100)
    ap.add_argument("--configs", nargs="*", default=["1x10", "4x2"],
                    help="batch_images x chunk pairs (1x10 = the pre-round-3 per-image path)")
    args = ap.parse_args()

    from diffmining_tpu.diffusion.schedule import make_schedule
    from diffmining_tpu.models.unet import SD15_UNET, UNet2DCondition
    from diffmining_tpu.ops.pool import pixel_typicality_map
    from diffmining_tpu.typicality.engine import TypicalityEngine, losses_to_reference_layout

    print(f"backend={jax.default_backend()} px={args.px} N={args.n_samples}")
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    unet = UNet2DCondition(SD15_UNET, dtype=dtype)
    hl = args.px // 8
    params = unet.init(rng, jnp.zeros((1, hl, hl, 4), dtype), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), dtype))
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    schedule = make_schedule()

    for cfg in args.configs:
        B, chunk = (int(v) for v in cfg.split("x"))
        engine = TypicalityEngine(
            unet=unet, unet_params=params, cast_params=False, schedule=schedule,
            n_samples=args.n_samples, t_min=0.0, t_max=1.0, chunk=chunk, dtype=dtype,
        )
        lat = jax.random.normal(rng, (B, hl, hl, 4), dtype=jnp.float32)
        ctx = jax.random.normal(rng, (B, 2, 77, 768), dtype=jnp.float32)
        try:
            # warm/compile, then the product loop incl. the host map conversion
            _ = np.asarray(engine.compute(lat, ctx, list(range(B)))[:, 0, 0, 0, 0, 0])
            t0 = time.perf_counter()
            done = 0
            while done < args.images:
                losses = engine.compute(lat, ctx, list(range(done, done + B)))
                for b in range(B):
                    grid = losses_to_reference_layout(np.asarray(losses[b]))
                    _dm = np.asarray(pixel_typicality_map(jnp.asarray(grid), args.px, args.px))
                done += B
            dt = time.perf_counter() - t0
            print(f"batch_images={B} chunk={chunk} (unet batch {B*chunk*2}): "
                  f"{args.images / dt * 3600.0:,.0f} imgs/hr  ({dt / args.images:.2f} s/img)")
        except Exception as e:
            print(f"batch_images={B} chunk={chunk}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
    main()
