"""Artifact-store helpers: atomic writes for the filesystem work queue.

The reference's caches are check-then-act (exists -> compute -> save,
SURVEY.md §5.2) which is safe across disjoint SLURM shards but leaves torn
files on preemption mid-write — a real hazard on preemptible TPU pods where
this framework is meant to run. All store writes go through atomic
temp+rename so `exists` implies complete.
"""
from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any

import numpy as np


def atomic_save_npy(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.save(f, arr)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def atomic_save_pickle(path: str, obj: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
