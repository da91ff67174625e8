"""End-to-end mining test: typicality artifacts → patch tables → DIFT
embeddings → k-means clusters → saved crops (the reference's `clustering`
golden path, cluster.py:330-380, on a tiny random stack)."""
import os
from os.path import join

import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.typicality.cluster import Cluster
from diffmining_tpu.typicality.compute import SD, Typicality

DECADES = ["1930", "1990"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ftt")
    rng = np.random.RandomState(0)
    for dec in DECADES:
        os.makedirs(join(root, dec))
        for i in range(3):
            arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(join(root, dec, f"img_{dec}_{i}.jpg"))
    sd = SD.init_tiny("ftt", DECADES)
    typ_path = str(tmp_path_factory.mktemp("typ"))
    typ = Typicality("ftt", None, str(root), typ_path, t_min=0.1, t_max=0.7, sd=sd, N=4)
    for dec in DECADES:
        items = [(p, dec) for p in typ.get_seeds_(dec)]
        typ.D[dec].compute_batch(items)
    cache = str(tmp_path_factory.mktemp("cache"))
    cl = Cluster("ftt", typ_path, str(root), cache, sd=sd, dift_sd=sd, kx=8, ky=8)
    return cl, str(root), cache


def test_patch_tables(setup):
    cl, root, cache = setup
    tables = cl.patch_tables(k_per_image=3)
    for dec in DECADES:
        df, df_random = tables[dec]
        assert len(df) == 9  # 3 images × 3 patches
        assert set(df.columns) == {"seed", "x_start", "y_start", "x_end", "y_end", "D", "origin"}
        assert (df.x_end - df.x_start == 8).all()
        # cache file exists and reloads identically
        assert os.path.isfile(join(cache, "clusters", dec + ".pkl"))
    t2 = cl.patch_tables(k_per_image=3)
    assert t2[DECADES[0]][0].equals(tables[DECADES[0]][0])


def test_clustering_end_to_end(setup):
    cl, root, cache = setup
    results = cl.clustering(feature_which="dift-161", k_per_image=3, k=9, num_clusters=2)
    for dec in DECADES:
        ranked = results[dec]
        assert len(ranked) == 2
        # ranked by aggregate typicality, descending
        assert ranked[0][1] >= ranked[1][1]
        total = sum(len(m) for m, _ in ranked)
        assert total == 9
        crop_dir = join(cache, "images", "clusters", "ranked", "dift-161", dec)
        assert len(os.listdir(crop_dir)) == 9
    # embeddings were cached
    emb_dir = join(cache, "embeddings", "dift-161")
    assert len(os.listdir(emb_dir)) > 0


def test_make_figure(setup, tmp_path_factory):
    cl, root, cache = setup
    figs = str(tmp_path_factory.mktemp("figs"))
    cl.make_figure(figs, min_im=2, hard_limit=4)
    out = join(figs, "clusters")
    assert os.path.isdir(out) and len(os.listdir(out)) > 0


def test_rank_images(setup):
    cl, _, _ = setup
    data = cl.rank_images(DECADES[0])
    assert len(data) == 3
    assert all(isinstance(v, float) for _, v in data)


def test_extract_top_k_images(setup, tmp_path_factory):
    cl, _, _ = setup
    out = str(tmp_path_factory.mktemp("ordered"))
    cl.extract_top_k_images(out, k=2)
    files = os.listdir(join(out, "ordered"))
    assert len(files) == len(DECADES) * 3  # D_least, D, random per category
