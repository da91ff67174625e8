"""Multi-host execution path (SURVEY §5.8): jax.distributed over 2 processes.

The reference trains multi-node through HF Accelerate's NCCL process group
(reference finetuning/base.py:86-96, args.py LOCAL_RANK); the TPU-native
equivalent is jax.distributed.initialize per host + a mesh over GLOBAL
devices + per-host batch slices. These tests simulate a 2-host pod with two
subprocesses × 4 virtual CPU devices each (the same 8-device global mesh the
rest of the suite uses in-process) and assert the distributed product CLIs
produce the SAME numbers as the single-process 8-device run.
"""
import json
import os
import socket
import subprocess
import sys
from os.path import join

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = join(ROOT, "tests", "_distributed_worker.py")

pytestmark = pytest.mark.slow  # two jax-importing subprocesses ≈ minutes


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(mode, common_args, timeout=900):
    """Launch the 2-process pod; returns both stdouts (asserts both OK)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker pins its own 4-device count
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, WORKER, mode, *common_args,
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
        ]
        procs.append(
            subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=env, cwd=ROOT, text=True,
            )
        )
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0 and "WORKER_OK" in out, out[-4000:]
    return outs


@pytest.fixture(scope="module")
def tiny_pipe(tmp_path_factory):
    """A tiny SD pipeline dir both 'hosts' (and the in-process baseline)
    load — identical weights by construction."""
    import jax

    from diffmining_tpu.typicality.compute import SD
    from diffmining_tpu.utils.export import save_pipeline_dir

    sd = SD.init_tiny("ftt", ["1930", "1990"])
    pipe = str(tmp_path_factory.mktemp("pipe") / "sd")
    save_pipeline_dir(
        pipe,
        sd.unet.config, jax.device_get(sd.unet_params),
        sd.vae.config, jax.device_get(sd.vae_params),
        sd.clip.config, jax.device_get(sd.clip_params),
        sd.schedule,
    )
    return pipe


@pytest.fixture(scope="module")
def ftt_data(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ftt_dist")
    rng = np.random.RandomState(0)
    for dec in ["1930", "1990"]:
        os.makedirs(join(root, dec))
        for i in range(8):
            Image.fromarray(rng.randint(0, 255, (36, 36, 3), dtype=np.uint8)).save(
                join(root, dec, f"f{dec}_{i}.jpg")
            )
    return str(root)


def _train_args(pipe, data, out):
    return [
        "--base_name_or_path", pipe,
        "--data_path", data,
        "--output_dir", out,
        "--train_batch_size", "8",
        "--max_train_steps", "3",
        "--resolution", "32",
        "--mixed_precision", "no",
        "--logging_steps", "1",
        "--checkpointing_steps", "100",
        "--dataloader_num_workers", "1",
    ]


def _read_losses(out_dir):
    path = join(out_dir, "logs", "metrics.jsonl")
    with open(path) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    return {r["step"]: r["train_loss"] for r in rows if "train_loss" in r}


def test_distributed_train_matches_single_process(tiny_pipe, ftt_data, tmp_path):
    """2-process × 4-device training must reproduce the single-process
    8-device losses exactly: same global mesh, same dp=8 sharding, same
    partitionable-threefry randoms — the process boundary is invisible."""
    from diffmining_tpu.finetuning.args import parse_args
    from diffmining_tpu.finetuning.base import BaseTrainer

    # single-process 8-device baseline (in-process; conftest's virtual mesh)
    ref_out = str(tmp_path / "ref")
    BaseTrainer("ftt", parse_args(_train_args(tiny_pipe, ftt_data, ref_out))).train()
    ref = _read_losses(ref_out)
    assert set(ref) == {1, 2, 3}

    dist_out = str(tmp_path / "dist")
    # previews on the DISTRIBUTED side only: sample() must run as an SPMD
    # computation over the 2-process mesh (global lat/ctx/vae/clip — the
    # ADVICE r4 mixed-devices bug) without moving the training numbers
    _run_pair(
        "finetune",
        _train_args(tiny_pipe, ftt_data, dist_out)
        + ["--log_previews", "--num_samples_log", "1",
           "--num_inference_steps", "2", "--logging_steps", "3"],
    )
    got = _read_losses(dist_out)
    assert set(got) == {3}
    np.testing.assert_allclose(got[3], ref[3], rtol=1e-5)

    # the collective orbax checkpoint finalized, and process 0 exported
    assert os.path.isdir(join(dist_out, "checkpoint-3", "state"))
    assert os.path.isfile(join(dist_out, "export", "model_index.json"))
    # process 0 wrote the preview grids (one per ftt sample category)
    plots = join(dist_out, "plots", "3")
    assert os.path.isdir(plots) and any(f.endswith(".png") for f in os.listdir(plots))


def test_distributed_typicality_matches_single_process(tiny_pipe, ftt_data, tmp_path):
    """The dp=8 sweep sharded across 2 processes writes the same artifacts as
    the single-process --mesh_dp 8 run (each host saves its addressable
    rows; together they cover the set)."""
    from diffmining_tpu.typicality import compute as compute_cli

    # fp32: bf16 runs differ at rounding level between freshly-compiled and
    # AOT-cache-loaded executables, which would mask a real wiring bug here
    common = [
        "-i", ftt_data, "-m", tiny_pipe, "--which", "ftt",
        "--make_submission", "--sub_split", "1",
        "--N", "4", "--batch_images", "8", "--dtype", "fp32",
    ]
    ref_typ = str(tmp_path / "typ_ref")
    compute_cli.main(
        common + ["-s", str(tmp_path / "sub_ref"), "-c", ref_typ, "--mesh_dp", "8"]
    )

    dist_typ = str(tmp_path / "typ_dist")
    _run_pair(
        "typicality",
        common + ["-s", str(tmp_path / "sub_dist"), "-c", dist_typ],
    )

    for dec in ["1930", "1990"]:
        names = sorted(os.listdir(join(ref_typ, dec)))
        assert names and names == sorted(os.listdir(join(dist_typ, dec)))
        for n in names:
            a = np.load(join(ref_typ, dec, n)).astype(np.float32)
            b = np.load(join(dist_typ, dec, n)).astype(np.float32)
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)
