"""End-to-end typicality pipeline tests on a tiny random stack (CPU).

Covers the golden-path contract of SURVEY.md §4c: artifact format, submission
work queue, idempotence, determinism, and the cond/null semantics of the
sweep.
"""
import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.typicality.compute import SD, D, Typicality
from diffmining_tpu.typicality.engine import (
    TypicalityEngine,
    losses_to_reference_layout,
    reference_layout_to_losses,
)

DECADES = ["1930", "1990"]


@pytest.fixture(scope="module")
def sd():
    return SD.init_tiny("ftt", DECADES)


@pytest.fixture(scope="module")
def ftt_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ftt")
    rng = np.random.RandomState(0)
    for dec in DECADES:
        os.makedirs(join(root, dec))
        for i in range(3):
            arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(join(root, dec, f"img_{dec}_{i}.jpg"))
    return str(root)


@pytest.fixture(scope="module")
def pipeline(sd, ftt_dataset, tmp_path_factory):
    typ_path = str(tmp_path_factory.mktemp("typicality"))
    typ = Typicality(
        "ftt", None, ftt_dataset, typ_path, t_min=0.1, t_max=0.7, sd=sd, N=8, batch_images=4
    )
    return typ, typ_path


def test_make_submission_balancing(pipeline, ftt_dataset, tmp_path_factory):
    typ, _ = pipeline
    sub = str(tmp_path_factory.mktemp("sub"))
    typ.make_submission(ftt_dataset, sub, sub_split=2)
    lines = []
    for i in range(2):
        with open(join(sub, f"{i}.txt")) as f:
            lines += [l.strip() for l in f if l.strip()]
    assert len(lines) == 6
    assert all("," in l for l in lines)


def test_compute_submission_writes_reference_layout(pipeline, ftt_dataset, tmp_path_factory):
    typ, typ_path = pipeline
    sub = str(tmp_path_factory.mktemp("sub2"))
    typ.make_submission(ftt_dataset, sub, sub_split=1)
    typ.compute_submission(join(sub, "0.txt"))
    for dec in DECADES:
        for i in range(3):
            path = join(ftt_dataset, dec, f"img_{dec}_{i}.jpg")
            assert typ.D[dec].exists(path)
            arr = typ.D[dec](path)
            # [N, n_cond, 4, h/f, w/f] fp16 — the reference artifact contract
            # (tiny VAE has 2 blocks -> f=2; SD-v1.5 has 4 -> f=8)
            assert arr.shape == (8, 2, 4, 16, 16)
            assert arr.dtype == np.float16
            assert np.isfinite(arr).all()

    # idempotence: a fresh submission finds nothing to do
    sub3 = str(tmp_path_factory.mktemp("sub3"))
    typ.make_submission(ftt_dataset, sub3, sub_split=1)
    with open(join(sub3, "0.txt")) as f:
        assert f.read().strip() == ""


def test_sweep_dedup_prefix_matches_upfront_tiling(sd):
    """The engine's prefix-dedup sweep equals the reference-layout sweep that
    tiles conditions up front (dedup is CSE on the condition-independent
    prefix, not a numerics change)."""
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 77, 32))
    kwargs = dict(
        unet=sd.unet, unet_params=sd.unet_params, schedule=sd.schedule,
        n_samples=4, chunk=2, t_min=0.1, t_max=0.7, dtype=jnp.float32,
    )
    off = TypicalityEngine(**kwargs, dedup_prefix=False).compute(lat, ctx, [1, 2])
    on = TypicalityEngine(**kwargs, dedup_prefix=True).compute(lat, ctx, [1, 2])
    np.testing.assert_allclose(
        np.asarray(off, np.float32), np.asarray(on, np.float32), rtol=2e-3, atol=1e-5
    )


def test_sweep_params_one_shared_bf16_copy():
    """SD.sweep_params casts fp32 -> bf16 ONCE; every engine references the
    same tree (VERDICT r2 weak #1: per-category copies were an HBM bomb)."""
    from diffmining_tpu.models.clip import TINY_CLIP_TEXT
    from diffmining_tpu.models.unet import TINY_UNET
    from diffmining_tpu.models.vae import TINY_VAE

    sd = SD.init_random(
        "ftt", ["1930"], TINY_UNET, TINY_VAE, TINY_CLIP_TEXT,
        dtype=jnp.bfloat16, image_size=32,
    )
    p1, p2 = sd.sweep_params(), sd.sweep_params()
    assert p1 is p2
    floats = [
        l for l in jax.tree_util.tree_leaves(p1)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert floats and all(l.dtype == jnp.bfloat16 for l in floats)
    eng = TypicalityEngine(
        unet=sd.unet, unet_params=p1, cast_params=False, schedule=sd.schedule,
        n_samples=2, chunk=1,
    )
    assert jax.tree_util.tree_leaves(eng.unet_params)[0] is jax.tree_util.tree_leaves(p1)[0]


def test_determinism_across_batching(pipeline, ftt_dataset):
    """The same image recomputed alone must byte-match its batched result —
    per-image fold_in RNG, not batch-position RNG."""
    typ, _ = pipeline
    dec = DECADES[0]
    path = join(ftt_dataset, dec, f"img_{dec}_0.jpg")
    d = typ.D[dec]
    before = d(path).copy()
    os.remove(d.get_path(path))
    d.compute(dec, path)
    after = d(path)
    np.testing.assert_array_equal(before, after)


def test_cond_null_semantics(sd):
    """With identical cond and null embeddings the two loss channels match."""
    eng = TypicalityEngine(
        unet=sd.unet, unet_params=sd.unet_params, schedule=sd.schedule,
        n_samples=4, chunk=2, t_min=0.1, t_max=0.7, dtype=jnp.float32,
    )
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    ctx_one = jax.random.normal(jax.random.PRNGKey(1), (77, 32))
    ctx = jnp.stack([ctx_one, ctx_one])[None].repeat(2, axis=0)
    losses = eng.compute(lat, ctx, [11, 22])
    np.testing.assert_allclose(
        np.asarray(losses[:, :, 0], np.float32), np.asarray(losses[:, :, 1], np.float32)
    )
    # and with different embeddings they differ
    ctx2 = jnp.stack([ctx_one, ctx_one * 0.0])[None].repeat(2, axis=0)
    l2 = eng.compute(lat, ctx, [11, 22])
    l3 = eng.compute(lat, ctx2, [11, 22])
    assert np.abs(np.asarray(l3[:, :, 1], np.float32) - np.asarray(l2[:, :, 1], np.float32)).max() > 0


def test_layout_roundtrip():
    x = np.random.RandomState(0).randn(3, 2, 5, 6, 4).astype(np.float16)  # [N,cond,h,w,C]
    ref = losses_to_reference_layout(jnp.asarray(x))
    assert ref.shape == (3, 2, 4, 5, 6)
    back = reference_layout_to_losses(ref)
    np.testing.assert_array_equal(back, x)


def test_t_range_respected(sd):
    """All sampled timesteps land in [t_min*T, t_max*T) — verify via the
    engine's own draw function."""
    from diffmining_tpu.typicality.engine import sample_noise_and_t

    _, t = sample_noise_and_t(jax.random.PRNGKey(0), 512, (4, 4, 4), 0.1, 0.7)
    t = np.asarray(t)
    assert t.min() >= 100 and t.max() < 700


def test_bucket_size_rescale_rules():
    """bucket_size floors the free long side to a multiple while the domain's
    short side stays exact (utils/images.rescale_for_domain)."""
    from PIL import Image as PILImage

    from diffmining_tpu.utils.images import rescale_for_domain

    img = PILImage.new("RGB", (300, 200))  # w > h
    out = rescale_for_domain(img, "cars", bucket_size=64)
    assert out.height == 256  # cars short side exact
    assert out.width % 64 == 0
    out2 = rescale_for_domain(img, "ftt", bucket_size=64)
    assert out2.size == (256, 192)  # native res, bucketed both dims


def test_pipeline_with_bucketing(sd, ftt_dataset, tmp_path_factory):
    """Sweep with bucket_size produces artifacts at the bucketed latent size
    and stays idempotent."""
    from os.path import join as j

    typ_path = str(tmp_path_factory.mktemp("typ_bucket"))
    typ = Typicality(
        "ftt", None, ftt_dataset, typ_path, t_min=0.1, t_max=0.7, sd=sd, N=4,
        batch_images=4, bucket_size=16,
    )
    dec = DECADES[0]
    items = [(p, dec) for p in typ.get_seeds_(dec)]
    typ.D[dec].compute_batch(items)
    arr = typ.D[dec](items[0][0])
    # 32px images bucket to 32 (multiple of 16) -> latent 16 with the tiny VAE
    assert arr.shape == (4, 2, 4, 16, 16)


def test_native_res_sweep(tmp_path_factory):
    """`--native_res` skips the cars/places domain downscale (reference
    compute.py:165-180 — a GPU-memory constant) and sweeps at the dataset's
    original resolution; artifacts follow the native latent geometry."""
    from diffmining_tpu.utils.images import rescale_for_domain

    img = Image.fromarray(np.zeros((40, 48, 3), np.uint8))
    assert rescale_for_domain(img, "cars").size[1] == 256  # short side scaled
    assert rescale_for_domain(img, "cars", native=True).size == (48, 40)
    assert rescale_for_domain(img, "places", native=True).size == (48, 40)

    root = tmp_path_factory.mktemp("cars")
    data = join(root, "train")
    os.makedirs(data)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8)).save(
        join(data, "car_0.jpg")
    )
    import json

    with open(data + ".json", "w") as f:
        json.dump({"car_0.jpg": {"year": 1930}}, f)
    sd_cars = SD.init_tiny("cars", ["1930"])
    typ_path = str(tmp_path_factory.mktemp("typ_native"))
    typ = Typicality(
        "cars", None, data, typ_path, t_min=0.1, t_max=0.7, sd=sd_cars,
        N=2, batch_images=1, native_res=True,
    )
    cat = list(typ.categories())[0]
    items = [(p, cat) for p in typ.get_seeds_(cat)]
    assert items
    typ.D[cat].compute_batch(items)
    arr = typ.D[cat](items[0][0])
    # tiny VAE f=2: native 40x48 -> 20x24 latent (the rescaled path would
    # be short-side 256 -> 128x154)
    assert arr.shape == (2, 2, 4, 20, 24)

    # Cluster geometry must match the native artifacts
    from diffmining_tpu.typicality.cluster import Cluster

    cl = Cluster(
        "cars", typ_path, data, str(tmp_path_factory.mktemp("cache_native")),
        sd=sd_cars, kx=8, ky=8, native_res=True,
    )
    assert cl.load_image(items[0][0]).size == (48, 40)
    dm = cl.load_typicality(cl.D[cat], items[0][0])
    assert dm.shape == (40 - 8 + 1, 48 - 8 + 1)
