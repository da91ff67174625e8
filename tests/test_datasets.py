"""Dataset loader fidelity tests: directory protocols + prompt templates match
the reference exactly (cars.py:40-77, ftt.py:37-66, geo.py:36-81,
places.py:34-70, xray/finetune.py:36-69)."""
import csv
import json
import os
from os.path import join

import numpy as np
import pytest
from PIL import Image

from diffmining_tpu.finetuning.datasets import CarDB, FTT, G3, G3r, XRay, BatchIterator
from diffmining_tpu.models.tokenizer import tiny_tokenizer


@pytest.fixture(scope="module")
def tok():
    return tiny_tokenizer()


def _img(path, size=(40, 40)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.random.RandomState(0).randint(0, 255, size + (3,), dtype=np.uint8)).save(path)


def _prompts(ds, i=0, n=400):
    return {ds.prompt(ds.items[i][1], __import__("random").Random(s)) for s in range(n)}


def test_cardb(tmp_path, tok):
    root = str(tmp_path)
    _img(join(root, "train", "car1.jpg"))
    _img(join(root, "train", "car2.jpg"))
    with open(join(root, "train.json"), "w") as f:
        json.dump({"car1.jpg": {"year": 1987}, "car2.jpg": {"year": 2003}}, f)
    ds = CarDB(root, tok)
    assert len(ds) == 2
    assert ds.items[0][1] == "1980"
    ps = _prompts(ds)
    assert "A car from the 1980s." in ps
    assert "A car." in ps  # 5% null keeps the period (cars.py:70-74)
    assert ps == {"A car from the 1980s.", "A car."}


def test_ftt_train_subdir_and_null_prompt(tmp_path, tok):
    root = str(tmp_path)
    _img(join(root, "train", "1950", "a.jpg"))
    ds = FTT(root, tok)
    assert len(ds) == 1
    ps = _prompts(ds)
    # null prompt has NO period (ftt.py:61-65)
    assert ps == {"A face portrait of the 1950s.", "A face portrait"}


def test_g3_layout_and_prompts(tmp_path, tok):
    root = str(tmp_path)
    for a in ("45", "135", "225", "315"):
        _img(join(root, "images", "id1", f"{a}.jpg"))
    with open(join(root, "metadata.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "country", "region"])
        w.writerow(["id1", "France", "Provence"])
    with open(join(root, "exclude.json"), "w") as f:
        json.dump(["id1/315.jpg"], f)
    ds = G3(root, tok)
    assert len(ds) == 3  # 4 angles - 1 excluded
    ps = _prompts(ds)
    assert "A google street view image in France" in ps
    # region branch APPENDS to the country prompt (geo.py:74-78)
    assert "A google street view image in France, at the region of Provence" in ps
    assert "A google street view image" in ps


def test_g3r_places_category_labels(tmp_path, tok):
    root = str(tmp_path)
    _img(join(root, "a", "arch", "x.jpg"))
    _img(join(root, "n", "nature", "wild", "y.jpg"))  # 3-level
    ds = G3r(root, tok)
    labels = {lbl for _p, lbl in ds.items}
    assert labels == {"arch", "wild_nature"}  # (places.py:41-46)
    ps = _prompts(ds, i=0)
    assert "Image of arch." in ps and "" in ps


def test_xray_prompt_forms(tmp_path, tok):
    root = str(tmp_path)
    _img(join(root, "images", "x1.png"))
    with open(join(root, "metadata.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Image Index", "Finding Labels"])
        w.writerow(["x1.png", "No Finding|Pleural_Thickening"])
    with open(join(root, "train_val_list.txt"), "w") as f:
        f.write("x1.png\n")
    ds = XRay(root, tok)
    assert len(ds) == 1
    ps = _prompts(ds)
    # underscores -> spaces, 'No Finding' lowercased, trailing period
    assert "Chest X-Ray with no finding, Pleural Thickening." in ps
    assert "Chest X-Ray." in ps


def test_batch_iterator_epoch_determinism(tmp_path, tok):
    root = str(tmp_path)
    for i in range(4):
        _img(join(root, "train", "1950", f"{i}.jpg"))
    ds = FTT(root, tok)
    ds.resolution = 16
    it = BatchIterator(ds, batch_size=2, seed=1)
    a = [b["prompt"] for b in it.epoch(0)]
    b = [b["prompt"] for b in it.epoch(0)]
    assert a == b  # same epoch -> same order and prompts
    c = [b["prompt"] for b in it.epoch(1)]
    assert len(c) == len(a)
