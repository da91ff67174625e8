"""Fetch the released diff-mining checkpoints + CarDB and convert them.

Reference: scripts/download-models.py + scripts/download-cardb.py (both are
thin huggingface_hub snapshot_download loops). This script reproduces that
surface and then chains every model through scripts_tpu/convert_models.py so
the result is a VERIFIED local pipeline dir in this framework's layout:

    python scripts_tpu/download_models.py --models xray ftt --out models/
    python scripts_tpu/download_models.py --cardb --out datasets/

Requires `huggingface_hub` and network egress; on an air-gapped machine run
convert_models.py directly on a checkpoint you brought over instead (the
import error below says exactly that).
"""
from __future__ import annotations

import argparse
import os
import zipfile

# the reference's released repo ids (download-models.py:2-3)
MODEL_REPOS = ["xray", "places", "g3", "ftt", "cardb"]


def download_cardb(out_dir: str) -> None:
    from huggingface_hub import snapshot_download

    local = os.path.join(out_dir, "cardb")
    snapshot_download(repo_id="diff-mining/cardb", local_dir=local, repo_type="dataset")
    # the dataset ships as per-split zips (download-cardb.py:6-11)
    for root, _dirs, files in os.walk(local):
        for f in files:
            if f.endswith(".zip"):
                p = os.path.join(root, f)
                with zipfile.ZipFile(p) as z:
                    z.extractall(root)
                os.remove(p)
    print(f"cardb extracted under {local}")


def download_model(name: str, out_dir: str, convert: bool = True) -> None:
    from huggingface_hub import snapshot_download

    raw = os.path.join(out_dir, "hub", name)
    snapshot_download(repo_id=f"diff-mining/{name}", local_dir=raw, repo_type="model")
    if not convert:
        return
    from scripts_tpu.convert_models import main as convert_main

    convert_main(raw, os.path.join(out_dir, name))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="*", default=None,
                   help=f"model repos to fetch (default: all of {MODEL_REPOS})")
    p.add_argument("--cardb", action="store_true", help="fetch + unzip the CarDB dataset")
    p.add_argument("--out", type=str, default="models")
    p.add_argument("--no_convert", action="store_true",
                   help="stop after the raw snapshot (skip convert+verify)")
    args = p.parse_args(argv)

    try:
        if args.cardb:
            download_cardb(args.out)
        for name in (MODEL_REPOS if args.models is None else args.models):
            download_model(name, args.out, convert=not args.no_convert)
    except ImportError as e:
        if e.name != "huggingface_hub":
            raise  # a missing dep in the convert chain is a different problem
        raise SystemExit(
            "huggingface_hub is not installed (air-gapped machine?). Copy a "
            "diffusers checkpoint over and run scripts_tpu/convert_models.py "
            "on it directly — the converter is the only required step."
        )
    except Exception as e:  # hub errors don't share one base class
        if "huggingface_hub" not in type(e).__module__ and "requests" not in type(e).__module__:
            raise
        raise SystemExit(
            f"hub fetch failed ({type(e).__name__}: {e}). No network egress? "
            "Copy a diffusers checkpoint over and run "
            "scripts_tpu/convert_models.py on it directly."
        )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
