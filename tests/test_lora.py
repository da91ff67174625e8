"""LoRA + gradient-checkpointing trainer options (reference base.py:199-205
init_lora, cars.py:130-132 gradient_checkpointing)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmining_tpu.finetuning.lora import count_lora_params, init_lora_params, merge_lora
from diffmining_tpu.finetuning.train import TrainStepBuilder, make_lr_schedule, make_optimizer
from diffmining_tpu.models.unet import TINY_UNET, UNet2DCondition
from diffmining_tpu.typicality.compute import SD


@pytest.fixture(scope="module")
def sd():
    return SD.init_tiny("ftt", ["1930"])


def test_lora_init_targets_attention_only(sd):
    lora = init_lora_params(sd.unet_params, rank=2, rng=jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves_with_path(lora)
    paths = {"/".join(str(p) for p in kp) for kp, _ in leaves}
    assert all("attn" in p for p in paths)
    assert any("to_q" in p for p in paths) and any("to_out_0" in p for p in paths)
    assert count_lora_params(lora) > 0


def test_lora_merge_identity_at_init(sd):
    """b=0 at init -> merged params equal the base params."""
    lora = init_lora_params(sd.unet_params, rank=2, rng=jax.random.PRNGKey(0))
    merged = merge_lora(sd.unet_params, lora)
    a = jax.tree_util.tree_leaves(sd.unet_params)
    b = jax.tree_util.tree_leaves(merged)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lora_training_only_updates_factors(sd):
    opt = make_optimizer(make_lr_schedule("constant", 1e-2, 0))
    b = TrainStepBuilder(
        unet=sd.unet, vae=sd.vae, clip=sd.clip, schedule=sd.schedule, optimizer=opt,
        vae_params=sd.vae_params, clip_params=sd.clip_params, lora_rank=2,
    )
    state = b.init_state(sd.unet_params, jax.random.PRNGKey(1))
    n_lora = count_lora_params(state.params)
    n_full = sum(x.size for x in jax.tree_util.tree_leaves(sd.unet_params))
    assert n_lora < n_full / 10  # low-rank factors are a small fraction
    step = b.build()
    images = jnp.zeros((2, 32, 32, 3))
    tokens = jnp.zeros((2, 77), jnp.int32)
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, loss = step(state, images, tokens, jax.random.PRNGKey(0))
    after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.isfinite(float(loss))
    assert np.abs(after - before).max() > 0
    # dense export merges without error and differs from base after a step
    dense = b.dense_params(state)
    base_leaves = jax.tree_util.tree_leaves(sd.unet_params)
    dense_leaves = jax.tree_util.tree_leaves(dense)
    assert any(np.abs(np.asarray(x) - np.asarray(y)).max() > 0 for x, y in zip(base_leaves, dense_leaves))


@pytest.mark.slow  # ~60 s/param gradient-parity pin (suite hygiene, VERDICT r4 #8)
@pytest.mark.parametrize("policy", ["full", "attn", "dots"])
def test_remat_same_outputs(sd, policy):
    """remat=True must not change the forward values or gradients, only
    memory — at every remat_policy (round-5 selective-remat lever)."""
    cfg = dataclasses.replace(TINY_UNET, remat=True, remat_policy=policy)
    unet_r = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    t = jnp.array([7])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    plain = sd.unet.apply(sd.unet_params, x, t, ctx)
    rem = unet_r.apply(sd.unet_params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(rem), rtol=1e-5, atol=1e-6)

    # gradients match the no-remat path (not just finite)
    def loss(unet, p):
        return jnp.sum(unet.apply(p, x, t, ctx) ** 2)

    g_plain = jax.grad(lambda p: loss(sd.unet, p))(sd.unet_params)
    g_rem = jax.grad(lambda p: loss(unet_r, p))(sd.unet_params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_rem)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_8bit_adam_train_step(sd):
    """--use_8bit_adam path: a step runs, params move, state moments are int8."""
    import jax.numpy as jnp
    import numpy as np

    from diffmining_tpu.finetuning.train import TrainStepBuilder, make_lr_schedule, make_optimizer

    opt = make_optimizer(make_lr_schedule("constant", 1e-3, 0), use_8bit=True)
    b = TrainStepBuilder(
        unet=sd.unet, vae=sd.vae, clip=sd.clip, schedule=sd.schedule, optimizer=opt,
        vae_params=sd.vae_params, clip_params=sd.clip_params,
    )
    state = b.init_state(sd.unet_params)
    # moment storage is int8
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    assert any(l.dtype == jnp.int8 for l in leaves if hasattr(l, "dtype"))
    step = b.build()
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, loss = step(state, jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 77), jnp.int32), jax.random.PRNGKey(0))
    after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.isfinite(float(loss))
    assert np.abs(after - before).max() > 0
