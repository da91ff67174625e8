"""Attention microbenchmark at the SD-v1.5 self-attention shapes.

Times XLA sdpa vs the Pallas flash kernel (forward-only by default, --grad
for fwd+bwd) with the in-jit fori_loop methodology (BENCH_NOTES.md — host
syncs through the relay are ~200 ms and block_until_ready is a no-op).

    python scripts_tpu/bench_attention.py [--batch 16] [--iters 20] [--grad]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

# (H, L, D): the three SD-v1.5 self-attention levels at 512px
SHAPES = [(8, 4096, 40), (8, 1024, 80), (8, 256, 160)]


def bench(fn, args, iters, repeats=3):
    @jax.jit
    def loop(*a):
        def body(i, q):
            out = fn(q, *a[1:])
            return (out * 0.001 + a[0] * 0.999).astype(q.dtype)

        q = jax.lax.fori_loop(0, iters, body, a[0])
        return jnp.float32(q[0, 0, 0, 0])

    _ = float(loop(*args))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1e3  # ms/call


def bench_grad(fn, args, iters, repeats=3):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def loop(q, k, v):
        def body(i, qkv):
            q, k, v = qkv
            dq, dk, dv = grad(q, k, v)
            return ((q * 0.999 + dq.astype(q.dtype) * 1e-6), k, v)

        q, k, v = jax.lax.fori_loop(0, iters, body, (q, k, v))
        return jnp.float32(q[0, 0, 0, 0])

    _ = float(loop(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--shapes", type=str, default=None, help="H,L,D[;H,L,D...] override")
    ap.add_argument("--tlayout", action="store_true", help="bench flash_attention_t on [B,H,D,L] operands (inference layout) instead of the standard kernel")
    ap.add_argument("--blocks", type=str, default=None,
                    help="bq,bk override (tlayout only; bypasses the auto policy)")
    ap.add_argument("--variant", default="auto",
                    choices=["auto", "online", "oneshot", "nomax"],
                    help="tlayout kernel variant: online softmax, one-shot "
                         "single-k-block, or multi-k-block no-max (round 5)")
    ap.add_argument("--dispatch-probe", action="store_true",
                    help="tlayout only: time ONE B-sized dispatch vs TWO "
                         "B/2 dispatches per loop step — the difference "
                         "bounds what 'dispatch overlap' could ever recover "
                         "(VERDICT r4 #3 lever)")
    args = ap.parse_args()

    from diffmining_tpu.ops.attention import sdpa_xla
    from diffmining_tpu.ops.flash_attention import (
        _flash_forward_t,
        flash_attention,
        flash_attention_t,
    )

    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(int(x) for x in s.split(",")) for s in args.shapes.split(";")]

    runner = bench_grad if args.grad else bench
    mode = "fwd+bwd" if args.grad else "fwd"
    print(f"backend={jax.default_backend()} batch={args.batch} mode={mode} tlayout={args.tlayout}")
    for h, l, d in shapes:
        k = jax.random.PRNGKey(0)
        if args.tlayout:
            qt = jax.random.normal(k, (args.batch, h, d, l), jnp.bfloat16)
            kt = jax.random.normal(k, (args.batch, h, d, l), jnp.bfloat16)
            vt = jax.random.normal(k, (args.batch, h, d, l), jnp.bfloat16)
            fn = flash_attention_t
            tag = ""
            if args.blocks or args.variant != "auto":
                bq = bk = None
                if args.blocks:
                    bq, bk = (int(x) for x in args.blocks.split(","))
                fn = functools.partial(
                    _flash_forward_t, block_q=bq, block_k=bk,
                    oneshot={"oneshot": True, "auto": None}.get(args.variant, False),
                    nomax=args.variant == "nomax",
                )
                tag = f" [{args.variant} bq={bq} bk={bk}]"
            if args.dispatch_probe:
                assert args.batch % 2 == 0
                one_ms = runner(fn, (qt, kt, vt), args.iters)

                def two(q, k, v, _fn=fn, _b=args.batch // 2):
                    a = _fn(q[:_b], k[:_b], v[:_b])
                    b2 = _fn(q[_b:], k[_b:], v[_b:])
                    return jnp.concatenate([a, b2], axis=0)

                two_ms = runner(two, (qt, kt, vt), args.iters)
                print(f"H{h} L{l} D{d}: 1×B{args.batch} {one_ms:.2f} ms | "
                      f"2×B{args.batch // 2} {two_ms:.2f} ms | "
                      f"dispatch overhead {two_ms - one_ms:+.2f} ms{tag}")
                continue
            pallas_ms = runner(fn, (qt, kt, vt), args.iters)
            print(f"H{h} L{l} D{d}: pallas_t {pallas_ms:.2f} ms{tag}")
            continue
        q = jax.random.normal(k, (args.batch, h, l, d), jnp.bfloat16)
        kk = jax.random.normal(k, (args.batch, h, l, d), jnp.bfloat16)
        v = jax.random.normal(k, (args.batch, h, l, d), jnp.bfloat16)
        xla_ms = runner(sdpa_xla, (q, kk, v), args.iters)
        pallas_ms = runner(flash_attention, (q, kk, v), args.iters)
        print(f"H{h} L{l} D{d}: xla {xla_ms:.2f} ms | pallas {pallas_ms:.2f} ms")


if __name__ == "__main__":
    main()
