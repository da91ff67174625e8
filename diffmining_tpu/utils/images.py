"""Image IO helpers: the reference's per-domain rescale rules + array conversion.

(reference: diffmining/typicality/compute.py:165-180 rescale, 126-132 load;
cars short-side 256, places short-side 512, geo/ftt native, LANCZOS.)

`bucket_size` optionally rounds the free long side DOWN to a multiple, keeping
XLA compile-shape counts bounded (the reference has no such constraint because
torch is eager; SURVEY.md §7 hard part 3). bucket_size=None reproduces
reference sizes exactly.
"""
from __future__ import annotations

import binascii
import math
import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def rescale_short_side(img: Image.Image, short: int, ceil_mode: bool = False) -> Image.Image:
    w, h = img.size
    rnd = math.ceil if ceil_mode else int
    if w > h:
        return img.resize((rnd(w * (short / h)), short), Image.LANCZOS)
    return img.resize((short, rnd(h * (short / w))), Image.LANCZOS)


def rescale_for_domain(
    img: Image.Image, which: str, bucket_size: Optional[int] = None, native: bool = False
) -> Image.Image:
    """Domain resize rules (reference compute.py:165-180: cars short-side 256,
    places short-side 512, geo/ftt native). `native=True` skips the domain
    resize entirely — mining at the dataset's original resolution, which the
    reference downscales for GPU memory; the flash-attention kernel handles
    the resulting 16k+-token sequences (BENCH_NOTES L=16384)."""
    if not native:
        if which == "cars":
            img = rescale_short_side(img, 256)
        elif which == "places":
            img = rescale_short_side(img, 512, ceil_mode=True)
    if bucket_size:
        w, h = img.size
        bw = max((w // bucket_size) * bucket_size, min(w, bucket_size))
        bh = max((h // bucket_size) * bucket_size, min(h, bucket_size))
        if (bw, bh) != (w, h):
            img = img.resize((bw, bh), Image.LANCZOS)
    return img


def image_to_array(img: Image.Image) -> np.ndarray:
    """PIL RGB -> [H, W, 3] float32 in [-1, 1] (reference compute.py:128-131)."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def array_to_image(arr: np.ndarray) -> Image.Image:
    """[H, W, 3] in [-1, 1] -> PIL RGB."""
    arr = np.clip((np.asarray(arr, dtype=np.float32) + 1.0) / 2.0, 0.0, 1.0)
    return Image.fromarray((arr * 255.0).round().astype(np.uint8))


def load_image(
    path: str, which: str = "", bucket_size: Optional[int] = None, native: bool = False
) -> Tuple[np.ndarray, Image.Image]:
    img = Image.open(path).convert("RGB")
    img = rescale_for_domain(img, which, bucket_size, native=native)
    return image_to_array(img), img


def image_uid(path: str) -> int:
    """Stable per-image RNG uid from the basename (so recomputation and
    sharded workers agree), replacing torch.manual_seed(42)-per-image."""
    return binascii.crc32(os.path.basename(path).encode("utf-8"))
