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
    from diffmining_tpu.models.unet import SD15_UNET, UNet2DCondition

    unet = UNet2DCondition(SD15_UNET, dtype=dtype)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--measure-cpu-baseline", action="store_true")
    args = ap.parse_args()

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
