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


@pytest.fixture(scope="module")
def clip_bundle():
    import jax
    import jax.numpy as jnp

    from diffmining_tpu.models.clip import CLIPVisionModel, TINY_CLIP_VISION

    model = CLIPVisionModel(TINY_CLIP_VISION)
    size = TINY_CLIP_VISION.image_size
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    return {"config": TINY_CLIP_VISION, "params": params}


def test_parse_feature_which():
    assert Cluster.parse_feature_which("dift-161") == (True, False, 161)
    assert Cluster.parse_feature_which("clip") == (False, True, None)
    assert Cluster.parse_feature_which("clip+dift-261") == (True, True, 261)


def test_clustering_clip_features(setup, clip_bundle):
    """`--feature_which clip` (reference cluster.py:243-301's else branch):
    patch features = CLIP image embedding of the crop, L2-normalized."""
    cl, root, cache = setup
    cl._clip_bundle = clip_bundle
    cl._clip_embed = None
    results = cl.clustering(feature_which="clip", k_per_image=3, k=9, num_clusters=2)
    assert sum(len(m) for m, _ in results[DECADES[0]]) == 9
    emb_dir = join(cache, "embeddings", "clip")
    embs = os.listdir(emb_dir)
    assert len(embs) > 0
    import pickle

    with open(join(emb_dir, embs[0]), "rb") as f:
        e = pickle.load(f)
    assert e.shape == (clip_bundle["config"].projection_dim,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-4)


def test_clustering_clip_plus_dift_features(setup, clip_bundle):
    """clip+dift-161 concatenates [clip crop embed, dift patch feature]
    (reference cluster.py:279-291)."""
    cl, root, cache = setup
    cl._clip_bundle = clip_bundle
    cl._clip_embed = None
    dfs = {c: cl.get_top_k(t[0], k=4) for c, t in cl.patch_tables(k_per_image=2).items()}
    X, ids, pils, ds, _ = cl.compute_embeddings(
        dfs[DECADES[0]], c=DECADES[0], feature_which="clip+dift-161"
    )
    # tiny stack: clip projection_dim + dift up_ft channel count
    clip_dim = clip_bundle["config"].projection_dim
    assert all(x.shape[0] > clip_dim for x in X)
    # the clip half is itself L2-normed, so the concat norm is sqrt(2)
    np.testing.assert_allclose(
        np.linalg.norm(X[0][:clip_dim]), 1.0, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.linalg.norm(X[0][clip_dim:]), 1.0, rtol=1e-4
    )


def test_patch_filters():
    from diffmining_tpu.typicality.cluster import filter_by_contrast, filter_by_gradient

    rng = np.random.RandomState(0)
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    noisy = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    assert not filter_by_contrast(flat)
    assert filter_by_contrast(noisy)
    assert not filter_by_gradient(flat)
    assert filter_by_gradient(noisy)
    # skimage parity (activates when the library exists in-image)
    skimage = pytest.importorskip("skimage")
    from skimage import exposure

    for img in (flat, noisy):
        assert filter_by_contrast(img) == (not exposure.is_low_contrast(img))


def test_get_top_k_filter_by(setup, tmp_path_factory):
    """filter_by drops low-contrast crops before ranking (reference
    utils.py:237-252's experimental surface, minus its fall-through bug)."""
    cl, root, cache = setup
    # one flat image whose patches must be filtered out
    flat_dir = join(root, DECADES[0])
    flat_path = join(flat_dir, "flat.jpg")
    Image.fromarray(np.full((32, 32, 3), 200, dtype=np.uint8)).save(flat_path)
    try:
        df = cl.patch_tables(k_per_image=2)[DECADES[0]][0]
        import pandas as pd

        extra = pd.DataFrame(
            [(flat_path, 0, 0, 8, 8, 99.0, "real")], columns=df.columns
        )
        df = pd.concat([df, extra], ignore_index=True)
        top_plain = cl.get_top_k(df, k=100)
        top_filtered = cl.get_top_k(df, k=100, filter_by=(("contrast", {}),))
        assert flat_path in set(top_plain.seed)
        assert flat_path not in set(top_filtered.seed)
        assert len(top_filtered) == len(top_plain) - 1
        # still sorted descending by D
        assert (top_filtered.D.values == np.sort(top_filtered.D.values)[::-1]).all()
    finally:
        os.remove(flat_path)


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


def test_typicality_overlay(setup):
    """Typicality-as-alpha composite (reference utils.py:165-214's recipe,
    reimplemented without its author-local artifact paths): formula pinned
    against a direct numpy computation of R = 0.05·I + 0.95·(T·I + (1−T))."""
    cl, root, cache = setup
    d = cl.D[DECADES[0]]
    path = cl.get_seeds(d, DECADES[0])[0]
    sigma = 2.0
    out = cl.typicality_overlay(d, path, sigma=sigma)
    pil = cl.load_image(path)
    assert out.size == pil.size

    from diffmining_tpu.ops.pool import gaussian_blur

    I = np.asarray(pil, np.float64) / 255.0
    T = cl.load_typicality_norm(d, path)
    ksize = 2 * int(4.0 * sigma + 0.5) + 1
    T = np.asarray(gaussian_blur(T, sigma, ksize), np.float64)
    T = T / max(float(T.max()), 1e-12)
    T = (T * (T > 0))[:, :, None]
    want = ((0.05 * I + 0.95 * (T * I + (1.0 - T))) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(out), want)
    # where typicality is lowest the composite washes toward white
    assert np.asarray(out).mean() >= np.asarray(pil).mean() * 0.9


def test_plot_top_k_overlays(setup):
    cl, root, cache = setup
    cl.plot_top_k(k_per_image=2, k=4, overlays=True)
    for dec in DECADES:
        outdir = join(cache, "images", "topk", "D", dec)
        files = os.listdir(outdir)
        plain = [f for f in files if not f.startswith("alpha-")]
        alpha = [f for f in files if f.startswith("alpha-")]
        assert len(alpha) == len(plain) == 4
        a = Image.open(join(outdir, "alpha-0.png"))
        p = Image.open(join(outdir, "0.png"))
        assert a.size == p.size


def test_make_topk_figure_with_overlays(setup, tmp_path_factory):
    """make_topk_figure must skip the alpha-{i}.png companions (its numeric
    sort key crashed on them before)."""
    cl, root, cache = setup
    cl.plot_top_k(k_per_image=2, k=4, overlays=True)
    figs = str(tmp_path_factory.mktemp("figs_ov"))
    cl.make_topk_figure(figs)
    assert os.path.isdir(join(figs, "topk"))
