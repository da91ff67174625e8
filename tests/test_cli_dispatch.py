"""Unified CLI dispatch + every module imports cleanly."""
import importlib
import pkgutil
import subprocess
import sys

import pytest

import diffmining_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(diffmining_tpu.__path__, "diffmining_tpu."):
        if ".lib" in mod.name:  # compiled .so artifacts, not python modules
            continue
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "diffmining_tpu", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert "typicality" in out.stdout and "doersch" in out.stdout


def test_cli_unknown_command():
    out = subprocess.run(
        [sys.executable, "-m", "diffmining_tpu", "nope"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode != 0
    assert "unknown command" in out.stderr


def test_cli_finetune_requires_which():
    out = subprocess.run(
        [sys.executable, "-m", "diffmining_tpu", "finetune"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode != 0
    assert "--which" in out.stderr
