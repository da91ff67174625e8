"""HTML report generator (typicality/make_html.py)."""
import os
from os.path import join

import numpy as np
from PIL import Image

from diffmining_tpu.typicality.make_html import generate_html, scan_figures


def _make_tree(figs):
    for mode in ("pt", "ft"):
        d = figs / mode / "0.1-0.7" / "clusters"
        os.makedirs(d)
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            d / "United States__hard_limit_20__top_k_32__min_im_6_ranked.png"
        )
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            d / "United States__other.png"  # non-ranked variant must lose
        )


def test_scan_prefers_ranked_figure(tmp_path):
    figs = tmp_path / "figures"
    _make_tree(figs)
    inv = scan_figures(str(figs))
    assert ("pt", "0.1-0.7", "United States") in inv
    assert inv[("pt", "0.1-0.7", "United States")].endswith("_ranked.png")


def test_generate_html(tmp_path):
    figs = tmp_path / "figures"
    _make_tree(figs)
    out = tmp_path / "html"
    index = generate_html(str(figs), str(out))
    html = open(index).read()
    # the figure inventory is embedded with NUL-joined keys
    assert "United States" in html
    assert "pt\\u00000.1-0.7\\u0000United States" in html
    assert "figures/ft/0.1-0.7/clusters" in html
    # figures copied next to the index
    assert os.path.isdir(join(str(out), "figures"))
    assert os.path.isfile(
        join(str(out), "figures", "pt", "0.1-0.7", "clusters",
             "United States__hard_limit_20__top_k_32__min_im_6_ranked.png")
    )
