"""Unified CLI: `python -m diffmining_tpu <command> ...`

One entry point over the per-stage CLIs (which mirror the reference's script
surface; reference: scripts/typicality.sh chains them):

    finetune   --which {cars,ftt,geo,places,xray} + trainer flags
    typicality typicality sweep (compute.py CLI)
    cluster    mining/clustering (cluster.py CLI)
    pnp        PnP translation
    parallel   parallel-dataset compute/cluster
    xray       X-ray localization eval
    doersch    Doersch-2012 baseline
    clipmining CLIP patch-ranking baseline
    html       figure-tree HTML report
    fidelity   compare typicality artifact trees
    verify_checkpoint  validate a converted pipeline dir (structure/forward/
                       probes/fidelity) — see utils/verify_checkpoint.py
"""
from __future__ import annotations

import sys


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "finetune":
        which = None
        if "--which" in argv:
            i = argv.index("--which")
            which = argv[i + 1]
            argv = argv[:i] + argv[i + 2 :]
        from diffmining_tpu.finetuning.args import parse_args

        if which is None:
            if "-h" in argv or "--help" in argv:
                parse_args(argv)  # argparse prints the trainer flags and exits
            raise SystemExit("finetune requires --which {cars,ftt,geo,places,xray}")
        from diffmining_tpu.finetuning.base import BaseTrainer

        BaseTrainer(which, parse_args(argv)).train()
    elif cmd == "typicality":
        from diffmining_tpu.typicality.compute import main as m

        m(argv)
    elif cmd == "cluster":
        from diffmining_tpu.typicality.cluster import main as m

        m(argv)
    elif cmd == "pnp":
        from diffmining_tpu.applications.pnp import main as m

        m(argv)
    elif cmd == "parallel":
        from diffmining_tpu.applications.parallel import main as m

        m(argv)
    elif cmd == "xray":
        from diffmining_tpu.applications.xray import main as m

        m(argv)
    elif cmd == "doersch":
        from diffmining_tpu.baselines.doersch import main as m

        m(argv)
    elif cmd == "clipmining":
        from diffmining_tpu.baselines.clipmining import main as m

        m(argv)
    elif cmd == "html":
        if not argv or "-h" in argv or "--help" in argv:
            raise SystemExit("usage: html <figures_dir> [output_dir] [nc]")
        from diffmining_tpu.typicality.make_html import generate_html

        generate_html(*argv)
    elif cmd == "fidelity":
        from diffmining_tpu.utils.fidelity import main as m

        m(argv)
    elif cmd == "verify_checkpoint":
        from diffmining_tpu.utils.verify_checkpoint import main as m

        raise SystemExit(m(argv))
    else:
        raise SystemExit(f"unknown command {cmd!r}\n{__doc__}")


if __name__ == "__main__":
    main()
