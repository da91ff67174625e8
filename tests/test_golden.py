"""Golden regression tests: typicality numerics pinned against recorded
values so kernel swaps (Pallas attention, fused ops) can't silently shift the
science. Goldens are generated once on CPU from the seeded tiny stack; the
assert tolerance (1 fp16 ULP-ish) allows compiler drift but not math changes.

Regenerate (only after an intentional change): pytest tests/test_golden.py
with DIFFMINING_REGEN_GOLDEN=1.
"""
import os
from os.path import dirname, join

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmining_tpu.ops.pool import typicality_map
from diffmining_tpu.typicality.compute import SD
from diffmining_tpu.typicality.engine import TypicalityEngine, losses_to_reference_layout

GOLDEN_DIR = join(dirname(__file__), "golden")
REGEN = os.environ.get("DIFFMINING_REGEN_GOLDEN") == "1"


def _check(name: str, arr: np.ndarray, rtol=2e-3, atol=2e-4):
    path = join(GOLDEN_DIR, name + ".npy")
    if REGEN or not os.path.isfile(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, arr)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
    want = np.load(path)
    np.testing.assert_allclose(
        np.asarray(arr, np.float32), np.asarray(want, np.float32), rtol=rtol, atol=atol
    )


@pytest.fixture(scope="module")
def losses():
    sd = SD.init_tiny("ftt", ["1930"])
    eng = TypicalityEngine(
        unet=sd.unet, unet_params=sd.unet_params, schedule=sd.schedule,
        n_samples=4, chunk=2, t_min=0.1, t_max=0.7, dtype=jnp.float32, seed=42,
    )
    lat = jax.random.normal(jax.random.PRNGKey(123), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 77, 32))
    return losses_to_reference_layout(eng.compute(lat, ctx, [99])[0])


def test_golden_loss_grid(losses):
    _check("tiny_losses", losses)


def test_golden_typicality_map(losses):
    dm = np.asarray(typicality_map(jnp.asarray(losses), 16, 16, 4, 4))
    _check("tiny_typicality_map", dm.astype(np.float32), rtol=1e-3, atol=1e-5)


def test_golden_dift_feature():
    """DIFT patch embedding pinned (guards UNet tap path + featurizer RNG)."""
    from diffmining_tpu.typicality.dift import SDFeaturizer

    sd = SD.init_tiny("ftt", ["1930"], seed=3)
    feat = SDFeaturizer(sd, seed=42)
    rng = np.random.RandomState(5)
    img = rng.rand(32, 32, 3).astype(np.float32) * 2 - 1
    emb = feat.patch_feature(img, "Portrait.", (4, 4, 20, 20), t=161, ensemble_size=2, uid=9)
    _check("tiny_dift_patch", emb.astype(np.float32), rtol=5e-3, atol=5e-4)


def test_golden_ddim_sample():
    """2-step CFG sample pinned (guards sampler + schedule integration)."""
    from diffmining_tpu.diffusion.sampling import sample_ddim

    sd = SD.init_tiny("ftt", ["1930"], seed=3)
    eps_fn = lambda p, x, t, c: sd.unet.apply(p, x, t, c)
    lat = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 4, 4))
    cond = jax.random.normal(jax.random.PRNGKey(12), (1, 77, 32))
    out = sample_ddim(eps_fn, sd.unet_params, sd.schedule, lat, cond, jnp.zeros_like(cond),
                      num_inference_steps=2, guidance_scale=7.5)
    _check("tiny_ddim_sample", np.asarray(out, np.float32), rtol=5e-3, atol=5e-4)
