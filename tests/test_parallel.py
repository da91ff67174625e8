"""Parallel-dataset pipeline test: typicality over translations, median-stack
mining, cross-country embeddings, clustering (tiny stack, CPU)."""
import os
from os.path import join

import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.applications.parallel import ParallelCluster, ParallelTypicality
from diffmining_tpu.typicality.compute import SD

COUNTRIES = ["France", "Japan"]


@pytest.fixture(scope="module")
def translated_dataset(tmp_path_factory):
    """PnP output layout: {root}/{source_country}/gt--{c}___sid.jpg +
    {target}___sid.jpg translations (reference pnp.py:605-627 protocol)."""
    root = tmp_path_factory.mktemp("parallel")
    rng = np.random.RandomState(0)
    for src in COUNTRIES:
        os.makedirs(join(root, src))
        for sid in ["a1", "b2"]:
            for prefix in [f"gt--{src}"] + [c for c in COUNTRIES if c != src]:
                arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                Image.fromarray(arr).save(join(root, src, f"{prefix}___{sid}.jpg"))
    return str(root)


@pytest.fixture(scope="module")
def computed(translated_dataset, tmp_path_factory):
    sd = SD.init_tiny("geo", COUNTRIES)
    typ_path = str(tmp_path_factory.mktemp("ptyp"))
    typ = ParallelTypicality(None, translated_dataset, typ_path, sd=sd, N=4)
    assert sorted(typ.parent.keys()) == COUNTRIES
    for c in COUNTRIES:
        items = [(p, c) for p in typ.get_seeds_(c)]
        assert len(items) == 4  # 2 gt + 2 translated per country label
        typ.D[c].compute_batch(items)
    return sd, typ, typ_path, translated_dataset


def test_parallel_groups(computed):
    sd, typ, typ_path, ds = computed
    # each source image groups gt + its translations
    for c in COUNTRIES:
        for group in typ.parallel[c]:
            assert group[0][1] == c
            assert {cc for _p, cc in group} == set(COUNTRIES)


def test_df_pd_median_stack(computed, tmp_path_factory):
    sd, typ, typ_path, ds = computed
    cache = str(tmp_path_factory.mktemp("pcache"))
    cl = ParallelCluster(typ_path, ds, cache, sd=sd, dift_sd=sd, kx=8, ky=8)
    df, df_random = cl.df_PD(k_per_image=2)
    assert len(df) == 2 * len(COUNTRIES) * 2  # 2 boxes × 2 sources × 2 images
    for c in COUNTRIES:
        assert c in df.columns and ("path_" + c) in df.columns
    # D is the median of the per-country values at the box corner
    row = df.iloc[0]
    vals = [row[c] for c in COUNTRIES]
    assert row["D"] == pytest.approx(float(np.median(vals)), rel=1e-5)


def test_parallel_clip_and_concat_modes(computed, tmp_path_factory):
    """clip / clip+dift feature modes (reference parallel cluster.py:153-190):
    clip = flattened concat of the per-country crop embeds (each L2-normed);
    clip+dift = [clip | dift]."""
    import jax
    import jax.numpy as jnp

    from diffmining_tpu.models.clip import CLIPVisionModel, TINY_CLIP_VISION

    sd, typ, typ_path, ds = computed
    cache = str(tmp_path_factory.mktemp("pcache3"))
    size = TINY_CLIP_VISION.image_size
    vision = CLIPVisionModel(TINY_CLIP_VISION)
    bundle = {
        "config": TINY_CLIP_VISION,
        "params": vision.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))),
    }
    cl = ParallelCluster(typ_path, ds, cache, sd=sd, dift_sd=sd, kx=8, ky=8, clip_bundle=bundle)
    df, _ = cl.df_PD(k_per_image=1)
    X, ids, pils, ds_, origins = cl.compute_embeddings(df.iloc[:2], feature_which="clip")
    D_clip = TINY_CLIP_VISION.projection_dim * len(COUNTRIES)
    assert all(x.shape == (D_clip,) for x in X)
    # each country's slice is L2-normed
    np.testing.assert_allclose(
        np.linalg.norm(X[0][: TINY_CLIP_VISION.projection_dim]), 1.0, rtol=1e-4
    )
    Xc, *_ = cl.compute_embeddings(df.iloc[:2], feature_which="clip+dift-161")
    assert all(x.shape[0] > D_clip for x in Xc)
    np.testing.assert_allclose(Xc[0][:D_clip], X[0], rtol=1e-5)  # clip half cached+stable


def test_parallel_cli_figures_only_and_aliases(tmp_path, monkeypatch):
    """--figures_only regenerates figures without clustering compute, and the
    reference compute CLI's -i dataset alias parses (reference parity)."""
    import diffmining_tpu.applications.parallel as par

    os.makedirs(tmp_path / "data" / "France")
    called = []
    monkeypatch.setattr(par.ParallelCluster, "clustering",
                        lambda *a, **k: called.append("clustering"))
    monkeypatch.setattr(par.ParallelCluster, "make_figure",
                        lambda *a, **k: called.append("figure"))
    par.main(["-i", str(tmp_path / "data"), "-t", str(tmp_path / "typ"),
              "-c", str(tmp_path / "cache"), "--cluster", "--figures_only",
              "--figure_path", str(tmp_path / "figs")])
    assert called == ["figure"]


def test_parallel_clustering_end_to_end(computed, tmp_path_factory):
    sd, typ, typ_path, ds = computed
    cache = str(tmp_path_factory.mktemp("pcache2"))
    cl = ParallelCluster(typ_path, ds, cache, sd=sd, dift_sd=sd, kx=8, ky=8)
    clusters = cl.clustering(feature_which="dift-161", k_per_image=2, k=8, num_clusters=2, num_components=2)
    assert len(clusters) == 2
    assert clusters[0][1] >= clusters[1][1]  # ranked by aggregate D
    # member strips contain one crop per country side by side
    pil = clusters[0][0][0][0]
    assert pil.width >= 8 * len(COUNTRIES)
    # embedding dimension = concat over countries
    emb_dir = join(cache, "embeddings", "dift-161")
    assert len(os.listdir(emb_dir)) > 0
    figs = str(tmp_path_factory.mktemp("pfigs"))
    cl.make_figure(figs, k=8, num_clusters=2, min_im=1, feature_which="dift-161")
    assert os.path.isdir(join(figs, "clusters", "ranked", "dift-161", "2"))
