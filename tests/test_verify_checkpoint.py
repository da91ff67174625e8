"""verify_checkpoint command on the tiny stack: a correct export passes all
stages; a corrupted checkpoint fails the structure gate. This keeps the
one-command real-weight verification path (utils/verify_checkpoint.py)
working so the day SD-v1.5 weights land the >0.95 fidelity number is a
single invocation (BASELINE.md)."""
import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmining_tpu.typicality.compute import SD
from diffmining_tpu.utils.export import save_pipeline_dir
from diffmining_tpu.utils.verify_checkpoint import main as verify_main


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    sd = SD.init_tiny("cars", ["1920"])
    save_pipeline_dir(
        out,
        sd.unet.config, jax.device_get(sd.unet_params),
        sd.vae.config, jax.device_get(sd.vae_params),
        sd.clip.config, jax.device_get(sd.clip_params),
        sd.schedule,
    )
    return out, sd


def test_verify_passes_on_clean_export(pipeline_dir, tmp_path):
    out, sd = pipeline_dir
    # self-recorded probes (the torch recorder writes the same contract)
    rng = np.random.RandomState(0)
    image = np.tanh(rng.randn(32, 32, 3)).astype(np.float32)
    ids = jnp.asarray(sd.tokenizer(["A car at the 1920s."]))
    hidden = np.asarray(sd.clip.apply(sd.clip_params, ids))[0]
    from diffmining_tpu.diffusion.schedule import add_noise
    from diffmining_tpu.models.vae import AutoencoderKL

    mean = np.asarray(
        sd.vae.apply(sd.vae_params, jnp.asarray(image)[None], method=AutoencoderKL.encode)[0]
    )[0]
    lat = jnp.asarray(mean)[None] * sd.vae.config.scaling_factor
    noisy = add_noise(sd.schedule, lat, jnp.zeros_like(lat), jnp.asarray([261]))
    eps = np.asarray(sd.unet.apply(sd.unet_params, noisy, jnp.asarray([261], jnp.int32), jnp.asarray(hidden)[None]))[0]
    probes = str(tmp_path / "probes.npz")
    np.savez(
        probes, image=image, prompt=np.asarray("A car at the 1920s."), t=np.asarray(261),
        text_hidden=hidden, vae_mean=mean.transpose(2, 0, 1), unet_eps=eps.transpose(2, 0, 1),
    )
    assert verify_main([out, "--probes", probes]) == 0


def test_verify_torch_oracle_stage(pipeline_dir):
    """--torch_oracle loads the checkpoint's own weights into the in-repo
    torch transcription and pins forward parity with no external recordings
    (VERDICT r2 next #10): a clean export must PASS the stage."""
    pytest.importorskip("torch")
    out, _ = pipeline_dir
    assert verify_main([out, "--torch_oracle"]) == 0


@pytest.fixture(scope="module")
def rank_fixture(pipeline_dir, tmp_path_factory):
    """3-image ftt dataset + a 'reference' typicality tree swept with the
    same checkpoint (bitwise-equal trees by determinism)."""
    from PIL import Image

    from diffmining_tpu.typicality.compute import Typicality

    out, _sd = pipeline_dir
    root = tmp_path_factory.mktemp("rank")
    data = root / "ftt"
    rng = np.random.RandomState(3)
    os.makedirs(data / "1920")
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            data / "1920" / f"f{i}.jpg"
        )
    theirs = str(root / "theirs")
    typ = Typicality("ftt", out, str(data), theirs, N=4, t_min=0.1, t_max=0.7)
    for c in typ.categories():
        typ.D[c].compute_batch([(s, c) for s in typ.get_seeds_(c)])
    return str(data), theirs


@pytest.mark.slow
def test_verify_cluster_rank_stage(pipeline_dir, rank_fixture):
    """Stage 6 (cluster-rank): against a reference tree produced by the SAME
    checkpoint the full mining chain must come back with spearman 1.0 — the
    self-consistency anchor for the BASELINE.md >0.95 oracle. Exercises the
    whole path: sweep → patch union → DIFT → k-means → median rank."""
    out, _ = pipeline_dir
    data, theirs = rank_fixture
    rc = verify_main([
        out, "--which", "ftt", "--dataset", data, "--theirs", theirs,
        "--n_samples", "4", "--sweep_images", "2",
        # 16px boxes: ftt keeps the 64px test images native, so the pooled
        # map is (h-patch+1)^2 — a 64 patch would leave one box per image
        "--rank_images", "3", "--rank_clusters", "4", "--rank_patch", "16",
    ])
    assert rc == 0


@pytest.mark.slow
def test_cluster_rank_detects_scrambled_tree(pipeline_dir, rank_fixture, tmp_path):
    """The oracle must have teeth: negating the reference loss grids flips
    which patches/clusters are typical, and the rank correlation collapses
    well below the 0.95 gate."""
    import shutil
    from os.path import join as j

    from diffmining_tpu.utils.verify_checkpoint import cluster_rank_correlation

    out, _ = pipeline_dir
    data, theirs = rank_fixture
    bad = str(tmp_path / "scrambled")
    shutil.copytree(theirs, bad)
    for root, _dirs, files in os.walk(bad):
        for f in files:
            if f.endswith(".npy"):
                a = np.load(j(root, f))
                np.save(j(root, f), -a)
    per_cat = cluster_rank_correlation(
        out, data, "ftt", ours_tree=theirs, theirs_tree=bad,
        num_clusters=7, patch=16, cache_path=str(tmp_path / "cache"),
    )
    assert per_cat, "expected at least one category"
    assert all(v < 0.95 for v in per_cat.values()), per_cat


@pytest.mark.slow
def test_cluster_rank_cross_framework(pipeline_dir, rank_fixture, tmp_path):
    """Stage 6 ACROSS frameworks (VERDICT r4 #6): a 'theirs' artifact tree
    produced by the in-repo TORCH transcription chain — torch VAE encode,
    torch UNet eps-prediction, torch-side fp16 MSE store — from the same
    checkpoint and the same injected random draws must pass the >0.95
    cluster-rank gate against a jax-swept tree. This is the strongest
    fidelity statement available without real SD-v1.5 weights: the full
    mining chain (patch union → DIFT → k-means → median rank) sits on top
    of artifacts produced by two independent framework stacks."""
    torch = pytest.importorskip("torch")
    from diffmining_tpu.typicality.compute import Typicality
    from diffmining_tpu.utils.images import image_uid, load_image
    from diffmining_tpu.utils.torch_oracle import AutoencoderKLRef, UNet2DConditionRef
    from diffmining_tpu.utils.verify_checkpoint import cluster_rank_correlation
    from diffmining_tpu.utils.weights import load_pipeline_dir, load_safetensors_dir

    out, _ = pipeline_dir
    data, _bf16_tree = rank_fixture

    # ---- jax side: a dedicated fp32 sweep (N=4, t in [0.1, 0.7)) ----------
    ours_tree = str(tmp_path / "ours_fp32")
    typ = Typicality(
        "ftt", out, data, ours_tree, N=4, t_min=0.1, t_max=0.7,
        batch_images=3, dtype=jnp.float32,
    )
    for c in typ.categories():
        typ.D[c].compute_batch([(s, c) for s in typ.get_seeds_(c)])
    sd = typ.sd
    acp = np.asarray(sd.schedule.alphas_cumprod, np.float64)

    # ---- torch side: same checkpoint, same draws, independent stack -------
    p = load_pipeline_dir(out)
    ucfg, vcfg = p["unet"]["config"], p["vae"]["config"]
    tunet = UNet2DConditionRef(
        in_channels=ucfg.in_channels, out_channels=ucfg.out_channels,
        block_out_channels=ucfg.block_out_channels,
        layers_per_block=ucfg.layers_per_block,
        cross_attention_dim=ucfg.cross_attention_dim,
        num_attention_heads=ucfg.num_attention_heads,
        down_block_has_attn=ucfg.down_block_has_attn,
        norm_num_groups=ucfg.norm_num_groups,
        transformer_layers=ucfg.transformer_layers,
        flip_sin_to_cos=ucfg.flip_sin_to_cos, freq_shift=ucfg.freq_shift,
    ).eval()
    missing, _ = tunet.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32))
         for k, v in load_safetensors_dir(os.path.join(out, "unet")).items()},
        strict=False,
    )
    assert not missing
    tvae = AutoencoderKLRef(
        in_channels=vcfg.in_channels, out_channels=vcfg.out_channels,
        latent_channels=vcfg.latent_channels,
        block_out_channels=vcfg.block_out_channels,
        layers_per_block=vcfg.layers_per_block,
        norm_num_groups=vcfg.norm_num_groups,
        scaling_factor=vcfg.scaling_factor,
    ).eval()
    missing, _ = tvae.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32))
         for k, v in load_safetensors_dir(os.path.join(out, "vae")).items()},
        strict=False,
    )
    assert not missing

    torch_tree = str(tmp_path / "torch_tree")
    seed, N, t_lo, t_hi = 42, 4, 100, 700
    vae_base = jax.random.fold_in(jax.random.PRNGKey(seed), 7)
    sweep_base = jax.random.PRNGKey(seed)
    for c in typ.categories():
        os.makedirs(os.path.join(torch_tree, c), exist_ok=True)
        ctx = typ.D[c]._ctx_pair(c)  # [2, 77, D] cond-first — injected on both sides
        for path in typ.get_seeds_(c):
            arr, _img = load_image(path, "ftt")  # identical preprocessing
            uid = image_uid(path)
            with torch.no_grad():
                x = torch.from_numpy(arr.transpose(2, 0, 1)[None])
                mean, logvar = tvae.encode_moments(x)
                # the engine's exact posterior draw, injected (NHWC per image,
                # matching encode_vae_per_image's vmapped sample_latent)
                eps_v = np.asarray(jax.random.normal(
                    jax.random.fold_in(vae_base, uid),
                    (mean.shape[2], mean.shape[3], mean.shape[1]),
                    dtype=jnp.float32,
                ))
                std = torch.exp(0.5 * logvar)
                lat = (mean + std * torch.from_numpy(eps_v.transpose(2, 0, 1)[None])) \
                    * vcfg.scaling_factor
                # the engine's exact (eps, t) draws, injected
                kn, kt = jax.random.split(jax.random.fold_in(sweep_base, uid))
                hl, wl = lat.shape[2], lat.shape[3]
                noises = np.asarray(jax.random.normal(
                    kn, (N, hl, wl, vcfg.latent_channels), dtype=jnp.float32))
                ts = np.asarray(jax.random.randint(kt, (N,), t_lo, t_hi, dtype=jnp.int32))
                grids = []
                for n in range(N):
                    t = int(ts[n])
                    noise_t = torch.from_numpy(noises[n][None].transpose(0, 3, 1, 2))
                    noisy = float(np.sqrt(acp[t])) * lat + float(np.sqrt(1.0 - acp[t])) * noise_t
                    per_cond = []
                    for ci in range(2):
                        pred = tunet(noisy, torch.tensor([t]), torch.from_numpy(ctx[ci][None]))
                        per_cond.append(((pred.float() - noise_t) ** 2).half().numpy()[0])
                    grids.append(np.stack(per_cond, axis=0))
            np.save(
                os.path.join(torch_tree, c, os.path.basename(path).rsplit(".", 1)[0] + ".npy"),
                np.stack(grids),  # [N, 2, C, hl, wl] — the reference layout
            )

    per_cat = cluster_rank_correlation(
        out, data, "ftt", ours_tree=ours_tree, theirs_tree=torch_tree,
        num_clusters=7, patch=16, cache_path=str(tmp_path / "xcache"),
    )
    assert per_cat, "expected at least one category"
    assert all(v > 0.95 for v in per_cat.values()), per_cat


def test_verify_fails_on_corrupted_checkpoint(pipeline_dir, tmp_path):
    import shutil

    out, _ = pipeline_dir
    bad = str(tmp_path / "bad")
    shutil.copytree(out, bad)
    # corrupt: drop one UNet tensor and rename it (structure must FAIL)
    from safetensors.numpy import load_file, save_file

    f = join(bad, "unet", "diffusion_pytorch_model.safetensors")
    tensors = load_file(f)
    key = sorted(tensors)[0]
    tensors["not_a_real." + key] = tensors.pop(key)
    save_file(tensors, f)
    assert verify_main([bad]) == 1
