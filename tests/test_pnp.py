"""PnP translation smoke tests on the tiny stack (CPU)."""
import os
from os.path import join

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.applications.pnp import PNP, Generator
from diffmining_tpu.typicality.compute import SD


@pytest.fixture(scope="module")
def sd():
    return SD.init_tiny("geo", ["France", "Japan"])


@pytest.fixture(scope="module")
def pnp(sd):
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float32) * 2 - 1
    p = PNP(sd, inversion_steps=6, n_timesteps=4)
    p.invert(img, inversion_prompt="")
    return p, img


def test_inversion_trajectory(pnp):
    p, img = pnp
    assert p._trajectory.shape[0] == 6  # one latent per inversion step
    assert np.isfinite(np.asarray(p._source_latent, np.float32)).all()


def test_generate_targets(pnp):
    p, _ = pnp
    imgs = p.generate(["France", "Japan"])
    assert len(imgs) == 2
    assert imgs[0].size == (32, 32)


def test_injection_changes_output(pnp):
    """With injection disabled (pnp_f_t = pnp_attn_t = 0) the result differs
    from the injected run — the taps are actually flowing."""
    p, _ = pnp
    a = p.generate(["France"])[0]
    p2 = PNP(p.sd, inversion_steps=6, n_timesteps=4, pnp_f_t=0.0, pnp_attn_t=0.0)
    p2._trajectory, p2._source_latent = p._trajectory, p._source_latent
    b = p2.generate(["France"])[0]
    assert np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16)).max() > 0


def test_reconstruct(pnp):
    p, _ = pnp
    rec = p.reconstruct()
    assert rec.size == (32, 32)


def test_cfg_prefix_dedup_matches_tiled(pnp):
    """The ctx_tile=2 CFG pass must equal the up-front [x;x] tile — taps are
    batch-1 so injection broadcasts identically in both layouts. (Dedup is
    default-OFF since round 4 — measured ~25% slower at the 10-target
    translate, BENCH_NOTES — so the dedup variant is constructed explicitly.)"""
    p, _ = pnp
    assert not p.dedup_prefix  # default OFF (measured e2e regression)
    a = p.generate(["France", "Japan"])
    on = PNP(p.sd, inversion_steps=6, n_timesteps=4, dedup_prefix=True)
    on._trajectory, on._source_latent = p._trajectory, p._source_latent
    b = on.generate(["France", "Japan"])
    for x, y in zip(a, b):
        assert np.abs(np.asarray(x, np.int16) - np.asarray(y, np.int16)).max() <= 1


@pytest.mark.slow  # ~40 s batching-parity pin (suite hygiene, VERDICT r4 #8)
def test_batched_inversion_matches_single(sd):
    """invert() on a [S,H,W,3] stack must equal S independent inversions —
    batching only widens the batch axis (the product's --batch_sources path)."""
    rng = np.random.RandomState(3)
    imgs = rng.rand(3, 32, 32, 3).astype(np.float32) * 2 - 1
    batched = PNP(sd, inversion_steps=5, n_timesteps=4)
    batched.invert(imgs)
    assert batched.num_sources() == 3
    recs = batched.reconstruct_many()
    assert len(recs) == 3
    for s in range(3):
        single = PNP(sd, inversion_steps=5, n_timesteps=4)
        single.invert(imgs[s])
        np.testing.assert_allclose(
            np.asarray(batched._trajectory[:, s], np.float32),
            np.asarray(single._trajectory[:, 0], np.float32),
            rtol=1e-4, atol=1e-5,
        )
        # per-source translation from the batch == translation from the single
        a = batched.generate(["Japan"], source=s)[0]
        b = single.generate(["Japan"])[0]
        assert np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16)).max() <= 1
        # per-source reconstruct slices out of the batch
        r = batched.reconstruct(source=s)
        np.testing.assert_allclose(
            np.asarray(r, np.int16), np.asarray(recs[s], np.int16), atol=1
        )


def test_generator_batched_sources(sd, tmp_path):
    """A Generator over a same-shape group writes every source's files."""
    src_dir = tmp_path / "base" / "France"
    os.makedirs(src_dir)
    rng = np.random.RandomState(2)
    paths = []
    for i in range(2):
        p = str(src_dir / f"id_00{i}_0.jpg")
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    g = Generator(sd, paths, inversion_steps=4, n_timesteps=2)
    out = str(tmp_path / "out" / "France")
    g.plotum(out, ["France", "Japan"], batch_size=2)
    files = sorted(os.listdir(out))
    for i in range(2):
        assert f"gt--France_00{i}_0.jpg" in files
        assert f"inverted--France_00{i}_0.jpg" in files
        assert f"projected--France_00{i}_0.jpg" in files
        assert f"Japan_00{i}_0.jpg" in files


def test_generator_inversion_cache(sd, tmp_path):
    """--cache round-trip: a second Generator over cached sources must load
    the trajectory instead of re-inverting (byte-exact fp32 cache)."""
    src_dir = tmp_path / "base" / "France"
    os.makedirs(src_dir)
    rng = np.random.RandomState(5)
    paths = []
    for i in range(2):
        p = str(src_dir / f"id_c{i}_0.jpg")
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    cache = str(tmp_path / "cache")
    g1 = Generator(sd, paths, inversion_steps=4, n_timesteps=2, cache_dir=cache)
    traj1 = np.asarray(g1.pnp._trajectory, np.float32)
    assert len(os.listdir(cache)) == 2
    # the cached run must not invert at all
    import diffmining_tpu.applications.pnp as pnp_mod
    orig = pnp_mod.PNP.invert
    pnp_mod.PNP.invert = lambda *a, **k: (_ for _ in ()).throw(AssertionError("re-inverted"))
    try:
        g2 = Generator(sd, paths, inversion_steps=4, n_timesteps=2, cache_dir=cache)
    finally:
        pnp_mod.PNP.invert = orig
    np.testing.assert_array_equal(np.asarray(g2.pnp._trajectory, np.float32), traj1)
    # a different inversion_steps must MISS (keyed into the filename)
    g3 = Generator(sd, paths, inversion_steps=5, n_timesteps=2, cache_dir=cache)
    assert g3.pnp._trajectory.shape[0] == 5


def test_generator_file_protocol(sd, tmp_path):
    src_dir = tmp_path / "base" / "France"
    os.makedirs(src_dir)
    rng = np.random.RandomState(1)
    img_path = str(src_dir / "id_001_0.jpg")
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(img_path)
    g = Generator(sd, img_path, inversion_steps=4, n_timesteps=2)
    out = str(tmp_path / "out" / "France")
    g.plotum(out, ["France", "Japan"], batch_size=2)
    files = sorted(os.listdir(out))
    assert "gt--France_001_0.jpg" in files
    assert "inverted--France_001_0.jpg" in files
    assert "projected--France_001_0.jpg" in files  # self-translation
    assert "Japan_001_0.jpg" in files
