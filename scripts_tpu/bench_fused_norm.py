"""Microbenchmark: fused GroupNorm→SiLU→proj_in (Pallas) vs the XLA chain.

The SURVEY §7 step-2 experiment at the SD-v1.5 SpatialTransformer entry
shapes. In-jit fori_loop timing (BENCH_NOTES.md methodology).

    python scripts_tpu/bench_fused_norm.py [--batch 16] [--iters 50]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

# (H, W, C) at the three SD levels with attention (512px input)
SHAPES = [(64, 64, 320), (32, 32, 640), (16, 16, 1280)]


def bench(fn, args_, iters, repeats=3):
    @jax.jit
    def loop(x, *rest):
        def body(i, xx):
            out = fn(xx, *rest)
            return (xx * 0.999 + out.reshape(xx.shape) * 1e-4).astype(xx.dtype)

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.float32(x.reshape(-1)[0])

    _ = float(loop(*args_))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(loop(*args_))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from diffmining_tpu.ops.fused_norm import gn_act_proj, gn_act_proj_xla

    print(f"backend={jax.default_backend()} batch={args.batch}")
    for h, w, c in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.batch, h, w, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        wm = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
        bias = jnp.zeros((c,), jnp.float32)

        def xla_fn(xx, g=gamma, b=beta, ww=wm, bb=bias):
            return gn_act_proj_xla(xx, g, b, ww, bb, 32)

        def pallas_fn(xx, g=gamma, b=beta, ww=wm, bb=bias):
            return gn_act_proj(xx, g, b, ww, bb, 32)

        # numeric sanity once per shape
        a = np.asarray(xla_fn(x), np.float32).reshape(-1)
        bnum = np.asarray(pallas_fn(x), np.float32).reshape(-1)
        err = np.abs(a - bnum).max()
        xla_ms = bench(xla_fn, (x,), args.iters)
        pallas_ms = bench(pallas_fn, (x,), args.iters)
        print(f"{h}x{w}x{c}: xla {xla_ms:.3f} ms | pallas {pallas_ms:.3f} ms | max|Δ| {err:.4f}")


if __name__ == "__main__":
    main()
