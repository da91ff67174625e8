"""Capture + summarize a TPU op-level profile of the UNet eps-pred pass.

jax.profiler works through the axon relay (verified); this tool jits the
SD-v1.5 forward, traces a few passes, and prints the top fusions by device
time with their bytes_accessed — the workflow that identified attention-logit
materialization as the HBM bottleneck (BENCH_NOTES.md).

    python scripts_tpu/profile_unet.py [--batch 8] [--out /tmp/jax_trace]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(batch: int, out_dir: str) -> str:
    import jax
    import jax.numpy as jnp

    from diffmining_tpu.models.unet import SD15_UNET, UNet2DCondition

    unet = UNet2DCondition(SD15_UNET, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    c = jnp.zeros((batch, 77, 768), jnp.bfloat16)
    p = unet.init(jax.random.PRNGKey(0), x[:1], t[:1], c[:1])
    p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    fn = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
    _ = float(fn(p, x, t, c)[0, 0, 0, 0].astype(jnp.float32))  # compile
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = fn(p, x, t, c)
    _ = float(out[0, 0, 0, 0].astype(jnp.float32))
    jax.profiler.stop_trace()
    return glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)[-1]


def summarize(trace_file: str, top: int = 25) -> None:
    with gzip.open(trace_file, "rt") as f:
        data = json.load(f)
    agg, cnt, byt = collections.Counter(), collections.Counter(), {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            agg[name] += e["dur"]
            cnt[name] += 1
            ba = e.get("args", {}).get("bytes_accessed")
            if ba:
                byt[name] = int(ba)
    print(f"{'total ms':>10} {'calls':>6} {'GB/call':>8}  op")
    for name, dur in agg.most_common(top):
        gb = byt.get(name, 0) / 1e9
        print(f"{dur/1e3:10.2f} {cnt[name]:6d} {gb:8.2f}  {name[:80]}")


def hlo_copies(batch: int) -> None:
    """Compile the pass and attribute every layout copy/transpose in the
    OPTIMIZED HLO to its source op (metadata op_name) — the map for the
    copy-elimination work (MFU ledger row: ~7.7 ms/dispatch of copies)."""
    import re

    import jax
    import jax.numpy as jnp

    from diffmining_tpu.models.unet import SD15_UNET, UNet2DCondition

    unet = UNet2DCondition(SD15_UNET, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    c = jnp.zeros((batch, 77, 768), jnp.bfloat16)
    p = unet.init(jax.random.PRNGKey(0), x[:1], t[:1], c[:1])
    p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    compiled = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c)).lower(p, x, t, c).compile()
    txt = compiled.as_text()

    dtype_bytes = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}

    def shape_bytes(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dtype_bytes.get(dt, 4)

    rows = []
    for line in txt.splitlines():
        s = line.strip()
        m = re.match(r"%?[\w.-]+ = (\S+?) (copy|transpose)\(", s)
        if not m:
            # fusions whose root is a copy/transpose show up as kind=kLoop
            # fusions named *copy*; catch plain ops only here
            continue
        shape, kind = m.groups()
        src = ""
        mm = re.search(r'op_name="([^"]+)"', s)
        if mm:
            src = mm.group(1)
        rows.append((shape_bytes(shape), kind, shape, src))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} copy/transpose ops in optimized HLO, {total/1e9:.3f} GB touched (read+write = 2x)")
    print(f"{'MB':>9}  {'kind':>9}  shape / source")
    agg = collections.Counter()
    for b, kind, shape, src in rows[:60]:
        print(f"{b/1e6:9.2f}  {kind:>9}  {shape}  {src[:110]}")
        # aggregate by the layer-ish prefix of the op_name
        key = "/".join(src.split("/")[:4]) if src else "?"
        agg[key] += b
    print("\nby source prefix:")
    for k, v in agg.most_common(20):
        print(f"{v/1e6:9.2f} MB  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", type=str, default="/tmp/jax_trace")
    ap.add_argument("--summarize-only", type=str, default=None, help="existing trace.json.gz")
    ap.add_argument("--hlo", action="store_true", help="print copy/transpose attribution from optimized HLO instead of tracing")
    args = ap.parse_args()
    if args.hlo:
        hlo_copies(args.batch)
        return
    trace = args.summarize_only or capture(args.batch, args.out)
    print("trace:", trace)
    summarize(trace)


if __name__ == "__main__":
    main()
