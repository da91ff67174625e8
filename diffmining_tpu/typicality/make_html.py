"""Static HTML viewer over the cluster figure tree.

Rebuild of the reference's report generator (reference: diffmining/typicality/
make-html.py): walks `{figures_dir}/{pt|ft}/{t-range}/clusters/*.png`, emits a
radio-button viewer (category × model × t-range) and copies the figures next
to it. Pure filesystem work — no deps.
"""
from __future__ import annotations

import os
import shutil
import sys
from os.path import join


def generate_html(figures_dir: str, output_dir: str = "blurred-html", nc: str = "32") -> str:
    countries, ranges, pt_ft = set(), set(), set()
    figures_dir = os.path.abspath(figures_dir)
    output_dir = os.path.abspath(output_dir)
    figures_name = os.path.basename(figures_dir.rstrip(os.sep))

    for root, _dirs, files in os.walk(figures_dir):
        parts = root.split(os.sep)
        if parts[-1] == "clusters":
            for file in files:
                if file.endswith(".png"):
                    pt_ft.add(parts[-3])
                    ranges.add(parts[-2])
                    countries.add(file.split("__")[0])

    def radios(name: str, values) -> str:
        values = sorted(values)
        return "\n".join(
            f'<label><input type="radio" name="{name}" value="{v}" onchange="updateImage()" '
            f'{"checked" if v == values[0] else ""}>{v}</label>'
            for v in values
        )

    html = f"""<!DOCTYPE html>
<html>
<head>
    <script>
        function updateImage() {{
            var country = document.querySelector('input[name="country"]:checked').value;
            var range = document.querySelector('input[name="range"]:checked').value;
            var pt_ft = document.querySelector('input[name="pt_ft"]:checked').value;
            var imagePath = `{figures_name}/${{pt_ft}}/${{range}}/clusters/${{country}}__hard_limit_20__top_k_{nc}__min_im_6_ranked.png`;
            document.getElementById('image').src = imagePath;
        }}
        window.onload = updateImage;
    </script>
</head>
<body>
    <h1>Image Viewer</h1>
    <div><h2>Category:</h2>
    {radios('country', countries)}
    </div>
    <div><h2>Model:</h2>
    {radios('pt_ft', pt_ft)}
    </div>
    <div><h2>t_min-t_max:</h2>
    {radios('range', ranges)}
    </div>
    <br>
    <img id="image" src="" alt="Selected Image">
</body>
</html>
"""
    os.makedirs(output_dir, exist_ok=True)
    shutil.copytree(figures_dir, join(output_dir, figures_name), dirs_exist_ok=True)
    index = join(output_dir, "index.html")
    with open(index, "w") as f:
        f.write(html)
    return index


if __name__ == "__main__":
    generate_html(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) == 4 else "32")
