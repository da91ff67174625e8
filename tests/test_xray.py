"""X-ray localization eval tests: metrics are pure numpy with analytic
oracles; the pixel-map path runs on the tiny stack."""
import csv
import json
import os
from os.path import join

import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.applications.xray import (
    XRayTypicality,
    aucpr,
    compare_json_files,
    gaussian_blur,
    load_paths,
    mean_typicality,
    xray_prompt,
)
from diffmining_tpu.typicality.compute import SD


def test_prompt_template():
    assert xray_prompt("Cardiomegaly") == "Chest X-Ray with Cardiomegaly."
    assert xray_prompt("") == "Chest X-Ray"


def test_mean_typicality_indexing():
    dm = np.zeros((10, 10))
    dm[2:5, 6:9] = 3.0  # rows y=2..4, cols x=6..8
    assert mean_typicality((6, 2, 9, 5), dm) == pytest.approx(3.0)


def test_aucpr_perfect_predictor():
    dm = np.full((20, 20), 1e-9)
    # graded scores inside the bbox (recall rises while precision stays 1)
    dm[5:10, 5:10] = np.linspace(1e-3, 1e-2, 25).reshape(5, 5)
    v = aucpr((5, 5, 10, 10), dm)
    assert v > 0.9
    # random map scores poorly
    rng = np.random.RandomState(0)
    v2 = aucpr((5, 5, 10, 10), rng.rand(20, 20) * 1e-3)
    assert v2 < v


def test_gaussian_blur_preserves_mass():
    rng = np.random.RandomState(0)
    dm = rng.rand(64, 64).astype(np.float32)
    out = gaussian_blur(dm, sigma=4, ksize=15)
    assert out.shape == dm.shape
    assert abs(out.mean() - dm.mean()) < 0.01


def test_gaussian_blur_matches_numpy_reference():
    """The device-side separable conv must reproduce the host reference
    (same kernel, same reflect padding), incl. at the production 127/32."""
    from diffmining_tpu.applications.xray import gaussian_blur_np

    rng = np.random.RandomState(1)
    for shape, sigma, ksize in [((64, 64), 4.0, 15), ((140, 150), 32.0, 127)]:
        dm = rng.rand(*shape).astype(np.float32)
        np.testing.assert_allclose(
            gaussian_blur(dm, sigma, ksize), gaussian_blur_np(dm, sigma, ksize),
            rtol=2e-5, atol=2e-6,
        )


@pytest.fixture(scope="module")
def xray_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cxr")
    os.makedirs(join(root, "images"))
    rng = np.random.RandomState(0)
    names = ["a.png", "b.png"]
    for n in names:
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(join(root, "images", n))
    with open(join(root, "metadata.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Image Index", "Finding Labels"])
        w.writerow(["a.png", "Cardiomegaly|Effusion"])
        w.writerow(["b.png", "Pneumonia"])
    with open(join(root, "BBox_List_2017.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Image Index", "Finding Label", "Bbox [x", "y", "w", "h]"])
        # boxes in original coords; loader halves them
        w.writerow(["a.png", "Cardiomegaly", "20", "20", "40", "40"])
        w.writerow(["b.png", "Pneumonia", "10", "10", "60", "60"])
    return str(root)


def test_load_paths_halves_boxes(xray_dataset):
    parent = load_paths(xray_dataset, ["Cardiomegaly", "Pneumonia", "Effusion"])
    assert len(parent["Cardiomegaly"]) == 1
    path, bbox = parent["Cardiomegaly"][0]
    assert bbox == (10, 10, 30, 30)
    # Effusion has a label but no bbox -> not included
    assert len(parent["Effusion"]) == 0


def test_xray_mesh_matches_single_device(xray_dataset, tmp_path):
    """`xray --mesh_dp` shards the per-disease sweeps; maps must match the
    unsharded run (the engine pads the 1-image batch to dp)."""
    from diffmining_tpu.parallel.mesh import make_mesh

    sd = SD.init_tiny("xray", [])
    plain = XRayTypicality(sd, xray_dataset, str(tmp_path / "p"), ["Pneumonia"], N=4)
    sharded = XRayTypicality(
        sd, xray_dataset, str(tmp_path / "s"), ["Pneumonia"], N=4,
        mesh=make_mesh(dp=2, fsdp=1),
    )
    (path, _bb) = plain.parent["Pneumonia"][0]
    a = plain.pixel_maps("Pneumonia", [path])[0]
    b = sharded.pixel_maps("Pneumonia", [path])[0]
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)


def test_xray_end_to_end(xray_dataset, tmp_path):
    sd = SD.init_tiny("xray", [])
    out = str(tmp_path / "out")
    x = XRayTypicality(sd, xray_dataset, out, ["Cardiomegaly", "Pneumonia"], N=4)
    report, auc = x.main()
    assert set(report) == {"Cardiomegaly", "Pneumonia"}
    assert os.path.isfile(join(out, "report.json"))
    assert os.path.isfile(join(out, "auc.json"))
    assert os.path.isfile(join(out, "Cardiomegaly", "typicality", "a_loss_pixel.npy"))
    # cached rerun produces identical numbers
    report2, auc2 = x.main()
    assert report == report2 and auc == auc2
    # compare pt vs ft with itself -> zero improvement + the stripplot figure
    diff = compare_json_files(out, out)
    assert all(abs(v) < 1e-12 for v in diff.values())
    import importlib.util

    if importlib.util.find_spec("seaborn"):  # the plot is optional-dep gated
        assert os.path.isfile(join(out, "comparison2.png"))
