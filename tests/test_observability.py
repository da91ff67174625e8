"""Observability + artifact-store utilities."""
import json
import os
import time

import numpy as np

from diffmining_tpu.utils.artifacts import atomic_save_npy, atomic_save_pickle, load_pickle
from diffmining_tpu.utils.observability import MetricsLogger, StepTimer, Timer


def test_timer_elapsed(capsys):
    with Timer("tag") as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01
    assert "tag took" in capsys.readouterr().out


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m" / "metrics.jsonl")
    m = MetricsLogger(p)
    m.log(1, train_loss=0.5)
    m.log(2, train_loss=np.float32(0.25), lr=1e-4)
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["step"] == 1 and lines[0]["train_loss"] == 0.5
    assert isinstance(lines[1]["train_loss"], float)


def test_step_timer():
    t = StepTimer(smoothing=0.0)
    assert t.tick() is None
    time.sleep(0.01)
    ema = t.tick()
    assert ema and ema >= 0.01
    assert t.steps_per_sec() and t.steps_per_sec() <= 100


def test_atomic_saves(tmp_path):
    p = str(tmp_path / "a" / "x.npy")
    atomic_save_npy(p, np.arange(4))
    np.testing.assert_array_equal(np.load(p), np.arange(4))
    pp = str(tmp_path / "a" / "y.pkl")
    atomic_save_pickle(pp, {"k": [1, 2]})
    assert load_pickle(pp) == {"k": [1, 2]}
    assert not [f for f in os.listdir(str(tmp_path / "a")) if f.endswith(".tmp")]
