"""HTML report generator (typicality/make_html.py)."""
import os
from os.path import join

import numpy as np
from PIL import Image

from diffmining_tpu.typicality.make_html import generate_html


def test_generate_html(tmp_path):
    figs = tmp_path / "figures"
    for mode in ("pt", "ft"):
        d = figs / mode / "0.1-0.7" / "clusters"
        os.makedirs(d)
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            d / "1930__hard_limit_20__top_k_32__min_im_6_ranked.png"
        )
    out = tmp_path / "html"
    index = generate_html(str(figs), str(out))
    html = open(index).read()
    assert 'name="country" value="1930"' in html
    assert 'value="pt"' in html and 'value="ft"' in html
    assert 'value="0.1-0.7"' in html
    # figures copied next to the index
    assert os.path.isdir(join(str(out), "figures"))
