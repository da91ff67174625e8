"""Benchmark: UNet eps-prediction passes/sec/chip at 512px (the primary metric
of BASELINE.md) on the default JAX backend (TPU under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the CPU reference throughput for the same
workload recorded in bench_baseline.json (measured once with
`python bench.py --measure-cpu-baseline` — the reference repo publishes no
wall-clock numbers, BASELINE.md, so the CPU-measured figure is the anchor for
the ≥20×-per-chip target).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.makedirs(_cache_dir, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def build(batch: int, iters: int, dtype=jnp.bfloat16):
    """The timing loop lives INSIDE the jit (lax.fori_loop chaining the eps
    output back into the input) with a single scalar host fetch at the end:
    the axon relay's `block_until_ready` is a no-op and every host sync pays a
    ~200 ms tunnel round-trip, so external per-iteration timing is meaningless."""
    import dataclasses

    from diffmining_tpu.models.unet import SD15_UNET, UNet2DCondition

    cfg = SD15_UNET
    if jax.default_backend() == "tpu" and os.environ.get("DIFFMINING_FUSED_NORM", "0") != "0":
        # match the product inference stack (typicality SD enables the fused
        # GN→proj_in pass on TPU)
        cfg = dataclasses.replace(cfg, fused_norm=True)
    unet = UNet2DCondition(cfg, dtype=dtype)
    latents = jnp.zeros((batch, 64, 64, 4), dtype)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, 768), dtype)
    params = unet.init(jax.random.PRNGKey(0), latents[:1], t[:1], ctx[:1])
    if dtype == jnp.bfloat16:
        # inference-cast: fp32 master weights would otherwise be re-converted
        # (and re-read at 2x bytes from HBM) on every pass
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    @jax.jit
    def loop(p, x, tt, c):
        def body(i, xx):
            eps = unet.apply(p, xx, tt, c)
            return (eps * 0.01).astype(xx.dtype)  # chain dependency

        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp.float32(out[0, 0, 0, 0])

    return loop, params, latents, t, ctx


def measure(batch: int, iters: int, warmup: int, dtype=jnp.bfloat16) -> float:
    fn, params, latents, t, ctx = build(batch, iters, dtype)
    _ = float(fn(params, latents, t, ctx))  # compile + warm
    times = []
    for _ in range(max(warmup, 1)):
        t0 = time.perf_counter()
        _ = float(fn(params, latents, t, ctx))  # one RTT per call
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch * iters / dt


def measure_e2e_typicality(
    n_images: int = 16, n_samples: int = 100, image_px: str = "512",
    chunk: int = 4, batch: int = 4,
) -> float:
    """End-to-end typicality throughput (images/hr): VAE encode + N paired
    cond/null UNet sweeps per image, on synthetic data at the production
    config (BASELINE.md primary metric #2). `image_px` accepts "512" or
    "HxW" (e.g. "512x768" for the places portrait shape, "1024" for the
    native-res mining path — long sequences ride the flash kernel)."""
    import numpy as np

    from diffmining_tpu.diffusion.schedule import make_schedule
    from diffmining_tpu.models.unet import SD15_UNET, UNet2DCondition
    from diffmining_tpu.models.vae import SD15_VAE, AutoencoderKL
    from diffmining_tpu.typicality.engine import TypicalityEngine

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    unet = UNet2DCondition(SD15_UNET, dtype=dtype)
    hw = [int(v) for v in str(image_px).lower().split("x")]
    h_px, w_px = (hw[0], hw[0]) if len(hw) == 1 else (hw[0], hw[1])
    lat_shape = (1, h_px // 8, w_px // 8, 4)
    params = unet.init(rng, jnp.zeros(lat_shape, dtype), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), dtype))
    engine = TypicalityEngine(
        unet=unet, unet_params=params, schedule=make_schedule(),
        n_samples=n_samples, t_min=0.1, t_max=0.7, chunk=chunk, dtype=dtype,
    )
    B = batch
    lat = jax.random.normal(rng, (B,) + lat_shape[1:], dtype=jnp.float32)
    ctx = jax.random.normal(rng, (B, 2, 77, 768), dtype=jnp.float32)
    # warm/compile
    _ = float(jnp.sum(engine.compute(lat, ctx, list(range(B)))[:, 0, 0, 0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    done = 0
    while done < n_images:
        out = engine.compute(lat, ctx, list(range(done, done + B)))
        done += B
    _ = float(jnp.sum(out[:, 0, 0, 0, 0, 0].astype(jnp.float32)))  # host sync
    dt = time.perf_counter() - t0
    return n_images / dt * 3600.0


def _probe_devices(timeout_s: float) -> str | None:
    """The axon relay has multi-hour outages during which `jax.devices()`
    hangs forever (no error). Probe it on a daemon thread so the bench can
    report an honest failure line instead of hanging the driver."""
    import threading

    result: dict = {}

    def probe():
        try:
            result["devs"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, don't crash
            result["err"] = repr(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return f"device probe timed out after {timeout_s:.0f}s (axon tunnel down?)"
    return result.get("err")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--measure-cpu-baseline", action="store_true")
    ap.add_argument("--e2e", action="store_true", help="end-to-end typicality images/hr")
    ap.add_argument("--e2e-chunk", type=int, default=2, help="samples per sweep step (UNet batch = 4*chunk*2; 16 is the measured v5e optimum)")
    ap.add_argument("--e2e-px", type=str, default="512",
                    help='sweep resolution: "512", "512x768" (places portrait), "1024" (native-res mining)')
    ap.add_argument("--e2e-batch", type=int, default=4, help="images per sweep dispatch")
    ap.add_argument("--e2e-images", type=int, default=16)
    args = ap.parse_args()

    if not args.measure_cpu_baseline:
        err = _probe_devices(float(os.environ.get("DIFFMINING_BENCH_PROBE_TIMEOUT", "1200")))
        if err is not None:
            metric = (
                "typicality_images_per_hr_512px_N100"
                if args.e2e
                else "unet_eps_pred_passes_per_sec_per_chip_512px"
            )
            print(json.dumps({
                "metric": metric, "value": 0.0,
                "unit": "images/hr" if args.e2e else "passes/s",
                "vs_baseline": None, "error": err,
            }))
            raise SystemExit(1)

    if args.e2e:
        iph = measure_e2e_typicality(
            n_images=args.e2e_images, image_px=args.e2e_px,
            chunk=args.e2e_chunk, batch=args.e2e_batch,
        )
        px_tag = args.e2e_px.replace("x", "_")
        print(json.dumps({
            "metric": f"typicality_images_per_hr_{px_tag}px_N100",
            "value": round(iph, 1), "unit": "images/hr", "vs_baseline": None,
        }))
        return

    if args.measure_cpu_baseline:
        jax.config.update("jax_platforms", "cpu")
        pps = measure(batch=1, iters=2, warmup=1, dtype=jnp.float32)
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "cpu_unet_passes_per_sec": pps,
                    "note": "fp32 SD-v1.5 UNet eps-pred at 512px (64x64 latents), single-core CPU, batch 1",
                },
                f,
                indent=2,
            )
        print(json.dumps({"metric": "cpu_baseline_passes_per_sec", "value": pps, "unit": "passes/s"}))
        return

    pps = measure(args.batch, args.iters, args.warmup)
    baseline = None
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("cpu_unet_passes_per_sec")
    vs = pps / baseline if baseline else None
    print(
        json.dumps(
            {
                "metric": "unet_eps_pred_passes_per_sec_per_chip_512px",
                "value": round(pps, 3),
                "unit": "passes/s",
                "vs_baseline": (round(vs, 2) if vs else None),
            }
        )
    )


if __name__ == "__main__":
    main()
