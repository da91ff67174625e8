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


@pytest.mark.parametrize("cmd,mod", [
    ("typicality", "diffmining_tpu.typicality.compute"),
    ("cluster", "diffmining_tpu.typicality.cluster"),
    ("pnp", "diffmining_tpu.applications.pnp"),
    ("parallel", "diffmining_tpu.applications.parallel"),
    ("xray", "diffmining_tpu.applications.xray"),
    ("doersch", "diffmining_tpu.baselines.doersch"),
    ("clipmining", "diffmining_tpu.baselines.clipmining"),
    ("fidelity", "diffmining_tpu.utils.fidelity"),
])
def test_subcommand_help_exits_clean(cmd, mod, capsys):
    """Every subcommand's --help must print usage and exit 0 (in-process:
    argparse raises SystemExit(0) — guards argparse wiring regressions
    without paying 11 subprocess interpreter startups)."""
    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as e:
        m.main(["--help"])
    assert e.value.code in (0, None)
    assert "usage" in capsys.readouterr().out.lower()


def test_finetune_help_exits_clean(capsys):
    """finetune's --help goes through parse_args (the dispatcher strips
    --which first) — the most convoluted help path, so pin it too."""
    from diffmining_tpu.finetuning.args import parse_args

    with pytest.raises(SystemExit) as e:
        parse_args(["--help"])
    assert e.value.code in (0, None)
    assert "usage" in capsys.readouterr().out.lower()


def test_verify_checkpoint_help_exits_clean(capsys):
    from diffmining_tpu.utils.verify_checkpoint import main as vmain

    with pytest.raises(SystemExit) as e:
        vmain(["--help"])
    assert e.value.code in (0, None)
    assert "usage" in capsys.readouterr().out.lower()


def test_html_help_is_dispatcher_level(monkeypatch):
    """`html` takes positionals (reference make-html.py argv order); its
    --help is answered by the dispatcher's usage line."""
    from diffmining_tpu.__main__ import main as dispatch

    monkeypatch.setattr(sys, "argv", ["diffmining_tpu", "html", "--help"])
    with pytest.raises(SystemExit) as e:
        dispatch()
    assert "usage: html" in str(e.value)


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
