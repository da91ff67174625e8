"""Op-level TPU profile of the full SD-v1.5 512px train step.

Same workflow as profile_unet.py but through TrainStepBuilder (remat + 8-bit
adam, the single-chip 512px config measured in BENCH_NOTES.md).

    python scripts_tpu/profile_trainstep.py [--batch 4] [--px 512]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_unet import summarize  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--out", default="/tmp/jax_trace_train")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import dataclasses
    import glob

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffmining_tpu.finetuning.train import TrainStepBuilder, make_lr_schedule, make_optimizer
    from diffmining_tpu.models.unet import UNet2DCondition
    from diffmining_tpu.typicality.compute import SD

    sd = SD.init_random("cars", ["1960"], image_size=64)
    unet = UNet2DCondition(dataclasses.replace(sd.unet.config, remat=True))
    opt = make_optimizer(make_lr_schedule("constant", 1e-5, 0), use_8bit=True)
    b = TrainStepBuilder(
        unet=unet, vae=sd.vae, clip=sd.clip, schedule=sd.schedule, optimizer=opt,
        vae_params=sd.vae_params, clip_params=sd.clip_params,
    )
    state = b.init_state(sd.unet_params)
    images = jnp.zeros((args.batch, args.px, args.px, 3), jnp.float32)
    tokens = jnp.zeros((args.batch, 77), jnp.int32)
    step = b.build()

    state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
    print("compiled, loss:", float(loss))
    jax.profiler.start_trace(args.out)
    for _ in range(3):
        state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
    _ = float(loss)
    jax.profiler.stop_trace()
    trace = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True)[-1]
    print("trace:", trace)
    summarize(trace, top=args.top)


if __name__ == "__main__":
    main()
