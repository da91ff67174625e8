"""Full Doersch iterative round wall-clock on TPU (VERDICT r3 weak #4 row).

Synthetic ftt-layout dataset -> one category end to end through the real
product code (baselines/doersch.py): HOG/LAB shard build, init-patch mining,
detector init (dense search), then the 3-fold iterative SVM clustering at a
configurable detector count. Per-stage wall-clock printed.

    python scripts_tpu/bench_doersch.py [--images 96] [--px 256] \
        [--num_detectors 1000] [--how_many 2000] [--folds 3]

The reference ran this on a file-lock multi-GPU pool (doersch/README +
dense_search_cuda); the per-stage numbers here are the single-chip v5e row.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
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
    ap.add_argument("--images", type=int, default=96, help="images per category (2 categories)")
    ap.add_argument("--px", type=int, default=256)
    ap.add_argument("--num_detectors", type=int, default=1000)
    ap.add_argument("--how_many", type=int, default=2000, help="init candidate patches (reference: 25000)")
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--keep", type=str, default=None, help="keep the work dir here (default: temp, deleted)")
    args = ap.parse_args()

    from PIL import Image

    from diffmining_tpu.baselines.doersch import Doersch

    print(f"backend={jax.default_backend()} images=2x{args.images} px={args.px} "
          f"detectors={args.num_detectors} folds={args.folds}")

    work = args.keep or tempfile.mkdtemp(prefix="bench_doersch_")
    data = os.path.join(work, "data")
    rng = np.random.RandomState(0)
    for cat in ("1930", "1990"):
        os.makedirs(os.path.join(data, cat), exist_ok=True)
        for i in range(args.images):
            Image.fromarray(rng.randint(0, 255, (args.px, args.px, 3), dtype=np.uint8)).save(
                os.path.join(data, cat, f"f{cat}_{i}.jpg")
            )

    d = Doersch(os.path.join(work, "out"), "ftt", data, how_many=args.how_many)
    c = "1930"

    t0 = time.perf_counter()
    shards = d.store.build_shards(d.positive_paths(c) + d.negative_paths(c), f"{c}-all")
    t_shards = time.perf_counter() - t0
    print(f"stage shards   : {t_shards:8.1f} s ({len(shards)} shards, {2 * args.images} images)")

    t0 = time.perf_counter()
    init = d.initialize_classifier(c, num_detectors=args.num_detectors)
    t_init = time.perf_counter() - t0
    print(f"stage init     : {t_init:8.1f} s ({len(init)} ranked detectors from {args.how_many} patches)")

    t0 = time.perf_counter()
    top = d.iterative_clustering(c, l=args.folds, num_detectors=args.num_detectors)
    t_iter = time.perf_counter() - t0
    print(f"stage iterate  : {t_iter:8.1f} s ({args.folds} folds x {args.num_detectors} detectors)")
    print(f"TOTAL          : {t_shards + t_init + t_iter:8.1f} s; top clusters: {len(top)}")

    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
