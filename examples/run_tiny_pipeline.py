"""End-to-end demo of the full product line on synthetic datasets.

Runs the complete reference flow (finetune -> export -> typicality sweep ->
patch mining/clustering -> figures/HTML), then the application line (PnP
translation -> parallel-dataset typicality + cross-country clustering) and
both baselines (Doersch-2012 HOG/SVM, CLIP patch ranking) on the tiny random
stack, CPU-only:

    python examples/run_tiny_pipeline.py /tmp/diffmine-demo

This is the "minimum end-to-end slice" of SURVEY.md §7 as one executable,
widened to every product surface.
"""
from __future__ import annotations

import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# force CPU unconditionally BEFORE any backend initialization: probing
# jax.default_backend() would initialize the axon TPU plugin, which both
# wastes the tunnel and fails hard when the relay is down — the tiny stack
# is CPU-sized by design
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
from PIL import Image

DECADES = ["1930", "1990"]


def make_dataset(root: str) -> str:
    rng = np.random.RandomState(0)
    data = join(root, "ftt", "train")
    for dec, base in [("1930", 30), ("1990", 170)]:
        os.makedirs(join(data, dec), exist_ok=True)
        for i in range(4):
            arr = (rng.randint(0, 80, (32, 32, 3)) + base).astype(np.uint8)
            Image.fromarray(arr).save(join(data, dec, f"img_{dec}_{i}.jpg"))
    return join(root, "ftt")


def main(root: str) -> None:
    from diffmining_tpu.finetuning.args import parse_args
    from diffmining_tpu.finetuning.base import BaseTrainer
    from diffmining_tpu.typicality.cluster import Cluster
    from diffmining_tpu.typicality.compute import SD, Typicality
    from diffmining_tpu.typicality.make_html import generate_html
    from diffmining_tpu.utils.export import save_pipeline_dir

    data_root = make_dataset(root)

    # 0. a "pretrained" tiny SD pipeline (random init stands in for SD-v1.5)
    sd0 = SD.init_tiny("ftt", DECADES)
    base_dir = join(root, "models", "base")
    save_pipeline_dir(
        base_dir, sd0.unet.config, sd0.unet_params, sd0.vae.config, sd0.vae_params,
        sd0.clip.config, sd0.clip_params, sd0.schedule,
    )
    print("[0] base pipeline:", base_dir)

    # 1. finetune for a few steps and export
    args = parse_args([
        "--base_name_or_path", base_dir,
        "--data_path", data_root,
        "--output_dir", join(root, "models", "ft"),
        "--train_batch_size", "2", "--max_train_steps", "4",
        "--resolution", "32", "--mixed_precision", "no", "--use_ema",
    ])
    export_dir = BaseTrainer("ftt", args).train()
    print("[1] finetuned export:", export_dir)

    # 2. typicality sweep (submission work queue -> jitted sweeps -> .npy)
    typ_path = join(root, "typicality")
    sub_path = join(root, "submission")
    typ = Typicality("ftt", export_dir, join(data_root, "train"), typ_path,
                     t_min=0.1, t_max=0.7, N=8, batch_images=4)
    typ.make_submission(join(data_root, "train"), sub_path, sub_split=1)
    typ.compute_submission(join(sub_path, "0.txt"))
    print("[2] typicality artifacts:", os.listdir(typ_path))

    # 3. mine + cluster + figures
    cache = join(root, "cache")
    figs = join(root, "figures", "ft", "0.1-0.7")
    cl = Cluster("ftt", typ_path, join(data_root, "train"), cache,
                 model_path=export_dir, kx=8, ky=8)
    cl.clustering(feature_which="dift-161", k_per_image=3, k=12, num_clusters=2)
    cl.plot_top_k(k_per_image=3, k=6, overlays=True)  # typicality-as-alpha composites
    cl.make_figure(figs, min_im=2, hard_limit=4)
    cl.make_topk_figure(figs)
    print("[3] clusters + figures:", os.listdir(join(figs, "clusters")))

    # 4. HTML report
    html = generate_html(join(root, "figures"), join(root, "html"))
    print("[4] report:", html)

    # 5. Doersch-2012 baseline (HOG+SVM detectors need 64x64 patches, so a
    #    second 128px mini-dataset)
    from diffmining_tpu.baselines.doersch import Doersch

    rng = np.random.RandomState(0)
    ddata = join(root, "doersch_data")
    for dec, base in [("1930", 40), ("1990", 200)]:
        os.makedirs(join(ddata, dec), exist_ok=True)
        for i in range(3):
            arr = (rng.randint(0, 55, (128, 128, 3)) + base).astype(np.uint8)
            Image.fromarray(arr).save(join(ddata, dec, f"d{dec}_{i}.jpg"))
    do = Doersch(join(root, "doersch"), "ftt", ddata, how_many=6, threshold=50)
    do.get_top("1930", top_k=3, top_elem=3)
    print("[5] doersch detectors:",
          [f for f in os.listdir(join(root, "doersch", "ftt", "1930")) if f.startswith("top_")])

    # 6. PnP translation (geo application; batched same-shape sources)
    from diffmining_tpu.applications.pnp import Generator

    countries = ["France", "Japan"]
    sdg = SD.init_tiny("geo", countries)
    gbase = join(root, "geo_base")
    for c in countries:
        os.makedirs(join(gbase, c), exist_ok=True)
        for sid in ("a1", "b2"):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)).save(
                join(gbase, c, f"{c}__{sid}_0.jpg")
            )
    trans = join(root, "translated")
    for c in countries:
        paths = [join(gbase, c, f) for f in sorted(os.listdir(join(gbase, c)))]
        g = Generator(sdg, paths, inversion_steps=4, n_timesteps=2)
        g.plotum(join(trans, c), countries, batch_size=2)
    print("[6] pnp translations:", sorted(os.listdir(join(trans, "France"))))

    # 7. parallel-dataset typicality + cross-country clustering
    from diffmining_tpu.applications.parallel import ParallelCluster, ParallelTypicality

    ptyp = join(root, "ptypicality")
    pt = ParallelTypicality(None, trans, ptyp, sd=sdg, N=4)
    for c in countries:
        pt.D[c].compute_batch([(p, c) for p in pt.get_seeds_(c)])
    pcl = ParallelCluster(ptyp, trans, join(root, "pcache"), sd=sdg, dift_sd=sdg, kx=8, ky=8)
    pclusters = pcl.clustering(feature_which="dift-161", k_per_image=2, k=8,
                               num_clusters=2, num_components=2)
    pfigs = join(root, "figures_parallel")
    pcl.make_figure(pfigs, k=8, num_clusters=2, min_im=1, feature_which="dift-161")
    print("[7] parallel clusters:", [len(members) for members, _d in pclusters])

    # 8. CLIP patch-ranking baseline over the translated tree (tiny towers)
    from diffmining_tpu.baselines.clipmining import CLIPRankCluster
    from diffmining_tpu.models.clip import (
        CLIPTextModelWithProjection, CLIPVisionModel, TINY_CLIP_TEXT, TINY_CLIP_VISION,
    )
    from diffmining_tpu.models.tokenizer import tiny_tokenizer

    rc = CLIPRankCluster(
        trans, join(root, "clip_cache"), "diff",
        vision=CLIPVisionModel(TINY_CLIP_VISION),
        text=CLIPTextModelWithProjection(TINY_CLIP_TEXT, projection_dim=16),
        tokenizer=tiny_tokenizer(TINY_CLIP_TEXT.vocab_size), crop=32, batch_images=2,
    )
    rc.clustering(k_per_image=2, k=8, num_clusters=2, hard_limit=4, kx=8, ky=8)
    print("[8] clip-baseline figures:",
          sorted(os.listdir(join(root, "clip_cache", "diff", "figures"))))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/diffmine-demo")
