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
