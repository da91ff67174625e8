"""Full-typicality-chain fidelity vs a torch transcription.

Bounds the ACCUMULATED semantic drift of the whole measuring instrument —
add_noise → UNet eps-prediction → per-pixel MSE → fp16 artifact → channel
mean → bilinear upsample → 1-stride box pool → null−cond typicality map —
against an independent torch implementation (tests/torch_sd_transcription.py
UNet + torch schedule math + torch interpolate/avg_pool). The SAME noise and
timesteps are injected into both sides, so any disagreement is semantics, not
RNG (SURVEY.md §7 hard-part 2 separates the two: RNG parity is impossible
across frameworks, semantic parity must be near-exact).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffmining_tpu.diffusion.schedule import add_noise, make_schedule
from diffmining_tpu.models.unet import UNet2DCondition, UNetConfig
from diffmining_tpu.ops.pool import typicality_map
from diffmining_tpu.utils.weights import convert_unet

from torch_sd_transcription import UNet2DConditionRef

CFG = dict(
    block_out_channels=(32, 64, 64),
    layers_per_block=2,
    cross_attention_dim=32,
    num_attention_heads=4,
    down_block_has_attn=(True, True, False),
    norm_num_groups=8,
)


def test_full_typicality_chain_matches_torch():
    torch.manual_seed(0)
    tref = UNet2DConditionRef(**CFG).eval()
    unet = UNet2DCondition(UNetConfig(**CFG), dtype=jnp.float32)
    params = {"params": convert_unet({k: v.detach().numpy() for k, v in tref.state_dict().items()})}

    schedule = make_schedule()  # SD-v1.5 scaled_linear constants
    acp = np.asarray(schedule.alphas_cumprod, np.float64)

    rng = np.random.RandomState(0)
    N, hl, wl = 4, 8, 8
    lat = rng.randn(1, hl, wl, 4).astype(np.float32)
    noises = rng.randn(N, hl, wl, 4).astype(np.float32)
    ts = np.array([120, 350, 480, 661], np.int32)
    ctx = rng.randn(2, 7, 32).astype(np.float32)  # [cond, null]

    # ---- ours: the engine's math on the same draws ----
    grids = []
    for n in range(N):
        noisy = add_noise(schedule, jnp.asarray(lat), jnp.asarray(noises[n : n + 1]), jnp.asarray(ts[n : n + 1]))
        per_cond = []
        for c in range(2):
            pred = unet.apply(params, noisy, jnp.asarray(ts[n : n + 1]), jnp.asarray(ctx[c : c + 1]))
            per_cond.append(np.asarray((pred.astype(jnp.float32) - noises[n : n + 1]) ** 2, np.float16))
        grids.append(np.stack([per_cond[0][0], per_cond[1][0]], axis=0))
    ours_grid = np.stack(grids).transpose(0, 1, 4, 2, 3)  # [N,2,C,hl,wl] reference layout
    H, W, KX, KY = 32, 32, 8, 8
    ours_map = np.asarray(typicality_map(jnp.asarray(ours_grid), H, W, KX, KY))

    # ---- torch: same chain, independent implementation ----
    with torch.no_grad():
        lat_t = torch.from_numpy(lat.transpose(0, 3, 1, 2))
        tgrids = []
        for n in range(N):
            t = int(ts[n])
            noise_t = torch.from_numpy(noises[n : n + 1].transpose(0, 3, 1, 2))
            noisy_t = float(np.sqrt(acp[t])) * lat_t + float(np.sqrt(1 - acp[t])) * noise_t
            per_cond = []
            for c in range(2):
                pred = tref(noisy_t, torch.tensor([t]), torch.from_numpy(ctx[c : c + 1]))
                per_cond.append(((pred.float() - noise_t) ** 2).half().numpy()[0])
            tgrids.append(np.stack(per_cond, axis=0))
        torch_grid = np.stack(tgrids)  # [N,2,C,hl,wl]

        dm = torch.from_numpy(torch_grid).float().mean(dim=2)  # [N,2,hl,wl]
        dm = torch.nn.functional.interpolate(dm, (H, W), mode="bilinear", align_corners=False)
        pooled = torch.nn.functional.avg_pool2d(dm, (KX, KY), stride=1)
        torch_map = (pooled[:, 1] - pooled[:, 0]).mean(dim=0).numpy()

    # artifact grids agree to fp16 resolution; maps near-exactly
    np.testing.assert_allclose(
        ours_grid.astype(np.float32), torch_grid.astype(np.float32), rtol=5e-2, atol=2e-3
    )
    np.testing.assert_allclose(ours_map, torch_map, rtol=1e-3, atol=1e-5)
    from diffmining_tpu.utils.fidelity import pearson

    assert pearson(ours_map, torch_map) > 0.9999
