"""Time flash-attention fwd+bwd on the real TPU: Pallas backward vs the
chunked-recompute JAX backward vs plain XLA attention.

Relay-safe timing: the timed region is a lax.fori_loop inside one jit with a
data dependence chain, ended by a single scalar host fetch (see BENCH_NOTES.md
— block_until_ready is a no-op through the axon relay).

Usage: python scripts_tpu/bench_flash_bwd.py [--b 8] [--h 8] [--l 4096] [--d 40]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--l", type=int, default=4096)
    ap.add_argument("--d", type=int, default=40)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffmining_tpu.ops.attention import sdpa_xla

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (args.b, args.h, args.l, args.d)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    def timed(fn_name, grad_fn):
        @jax.jit
        def loop(q, k, v):
            def body(_, c):
                dq, dk, dv = grad_fn(c[0], c[1], c[2])
                # chain output -> input so iterations cannot be elided/overlapped
                return (c[0] + dq * 1e-6, c[1] + dk * 1e-6, c[2] + dv * 1e-6)

            out = jax.lax.fori_loop(0, args.iters, body, (q, k, v))
            return out[0].sum()

        float(loop(q, k, v))  # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(loop(q, k, v))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{fn_name:28s} {best * 1e3:8.2f} ms/iter (fwd+bwd)")
        return best

    def make_grad(attn):
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))

    from diffmining_tpu.ops import flash_attention as fa

    print(f"shape B={args.b} H={args.h} L={args.l} D={args.d} bf16 on {jax.devices()[0]}")
    timed("xla sdpa", make_grad(sdpa_xla))
    os.environ["DIFFMINING_FLASH_BWD"] = "recompute"
    timed("flash fwd + recompute bwd", make_grad(fa.flash_attention))
    os.environ["DIFFMINING_FLASH_BWD"] = "pallas"
    timed("flash fwd + pallas bwd", make_grad(fa.flash_attention))


if __name__ == "__main__":
    main()
