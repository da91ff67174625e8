"""Full SD-v1.5 train-step throughput on one TPU chip at 512px.

Exercises the entire finetuning hot path (VAE encode, CLIP encode, UNet
fwd+bwd with flash attention, AdamW update) — the end-to-end surface for the
Pallas flash-attention backward kernel. Relay-safe timing: steps run inside a
lax.scan in one jit, one scalar host fetch at the end.

Usage: python scripts_tpu/bench_trainstep.py [--batch 4] [--px 512] [--steps 8]
       [--bwd pallas|recompute|auto] [--remat] [--use-8bit]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--bwd", default="auto")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default="full", choices=["full", "attn", "dots"],
                    help="selective remat (round-5 train-MFU lever, models/unet.py)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient accumulation steps (reference effective batch 64)")
    ap.add_argument("--accum-dtype", default="f32", choices=["f32", "bf16"],
                    help="accumulator storage dtype (bf16 halves the 3.4 GB buffer)")
    ap.add_argument("--use-8bit", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU (smoke test)")
    ap.add_argument("--defer-fetch", action="store_true",
                    help="product loop semantics: loss stays on device, one fetch per window")
    args = ap.parse_args()
    if args.accum > 1:
        # the timed window must hold a WHOLE number of accumulation windows:
        # under accumulate_every the boundary micro-step pays the optimizer
        # chain and the others don't, so a window with 0 (or 2) boundaries
        # would bias best-of-N low (or high)
        per = args.accum * max(1, round(args.steps / args.accum))
        if per != args.steps:
            print(f"accum={args.accum}: steps {args.steps} -> {per} (whole windows)")
            args.steps = per
    os.environ["DIFFMINING_FLASH_BWD"] = args.bwd

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from diffmining_tpu.finetuning.train import TrainStepBuilder, make_lr_schedule, make_optimizer
    from diffmining_tpu.models.unet import UNet2DCondition
    from diffmining_tpu.typicality.compute import SD

    sd = SD.init_random("cars", ["1960"], image_size=64)
    unet = sd.unet
    if args.remat:
        unet = UNet2DCondition(
            dataclasses.replace(unet.config, remat=True, remat_policy=args.remat_policy)
        )
    opt = make_optimizer(
        make_lr_schedule("constant", 1e-5, 0), use_8bit=args.use_8bit,
        accum_steps=args.accum,
        accum_dtype=(jnp.bfloat16 if args.accum_dtype == "bf16" else None),
    )
    b = TrainStepBuilder(
        unet=unet, vae=sd.vae, clip=sd.clip, schedule=sd.schedule, optimizer=opt,
        vae_params=sd.vae_params, clip_params=sd.clip_params,
        accum_steps=args.accum,
    )
    state = b.init_state(sd.unet_params)

    images = jnp.zeros((args.batch, args.px, args.px, 3), jnp.float32)
    tokens = jnp.zeros((args.batch, 77), jnp.int32)

    # NOTE: wrapping N steps in one lax.scan would be the relay-exact timing,
    # but the full SD-v1.5 train step serialized with a scan exceeds the axon
    # remote-compile body limit (HTTP 413). Instead: python loop over the
    # jitted step, forcing the loss scalar back each step — the fetch forces
    # that step's completion, so the measured time is an UPPER bound that
    # includes one ~200 ms relay round-trip per step.
    step = b.build()

    if args.defer_fetch:
        # the product train loop (finetuning/base.py): keep loss as a device
        # scalar, fetch ONCE per window — async dispatch keeps the device
        # pipeline full, paying one relay RTT per window instead of per step
        def loop(state):
            losses = []
            for _ in range(args.steps):
                state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
                losses.append(loss)
            return state, float(jnp.mean(jnp.stack(losses)))
    else:
        def loop(state):
            losses = []
            for _ in range(args.steps):
                state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
                losses.append(float(loss))
            return state, losses[-1]

    t0 = time.perf_counter()
    state, l = loop(state)
    compile_s = time.perf_counter() - t0
    print(f"compile+first {args.steps} steps: {compile_s:.1f}s  loss={l:.4f}")
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        state, l = loop(state)
        best = min(best, (time.perf_counter() - t0) / args.steps)
    ips = args.batch / best
    print(
        f"train-step B={args.batch} px={args.px} bwd={args.bwd} remat={args.remat}"
        f"/{args.remat_policy} accum={args.accum}/{args.accum_dtype} 8bit={args.use_8bit} "
        f"defer_fetch={args.defer_fetch}: {best*1e3:.1f} ms/step = {ips:.2f} img/s/chip"
    )


if __name__ == "__main__":
    main()
