"""HOG(31) + LAB patch features on-device.

TPU-native replacement for the skimage/Cython HOG and rgb2lab the Doersch
baseline uses (reference: doersch/hog.py:24-45 `get_hoglab_single`:
hog(orientations=31, pixels_per_cell=(8,8), cells_per_block=(8,8)) + a/b LAB
channels of 64×64 patches resized to 8×8). Feature layout matches the
reference exactly: per 8-px grid position, [8·8·31 block-normalized HOG | 2·8·8
LAB] = 2112 dims (then L2-normalized by the caller, hog.py:82-88).

skimage semantics replicated:
  * gradients: central differences with zeroed borders, channel of max
    magnitude per pixel;
  * hard orientation binning over [0°,180°), cell = mean magnitude per bin
    over 8×8 pixels;
  * blocks of 8×8 cells, stride 1 cell, L2-Hys normalization (clip 0.2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rgb2lab(rgb: jax.Array) -> jax.Array:
    """sRGB [H,W,3] in [0,1] -> CIE Lab (D65), matching skimage.color.rgb2lab."""
    rgb = rgb.astype(jnp.float32)
    linear = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    m = jnp.asarray(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        jnp.float32,
    )
    xyz = jnp.einsum("hwc,dc->hwd", linear, m)
    # D65 white point
    white = jnp.asarray([0.95047, 1.0, 1.08883], jnp.float32)
    t = xyz / white
    eps, kappa = 0.008856, 903.3
    f = jnp.where(t > eps, jnp.cbrt(t), (kappa * t + 16.0) / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def _channel_gradients(img: jax.Array):
    """skimage _hog_channel_gradient: forward/backward diff, zero borders."""
    g_row = jnp.zeros_like(img)
    g_row = g_row.at[1:-1].set(img[2:] - img[:-2])
    g_col = jnp.zeros_like(img)
    g_col = g_col.at[:, 1:-1].set(img[:, 2:] - img[:, :-2])
    return g_row, g_col


@functools.partial(jax.jit, static_argnames=("orientations", "cell", "block"))
def hog_features(
    img: jax.Array, orientations: int = 31, cell: int = 8, block: int = 8
) -> jax.Array:
    """[H,W,3] float in [0,1] -> [nbx, nby, block*block*orientations]."""
    g_row, g_col = _channel_gradients(img)
    mag = jnp.sqrt(g_row**2 + g_col**2)
    # per-pixel channel of max magnitude (skimage multichannel rule)
    idx = jnp.argmax(mag, axis=-1, keepdims=True)
    g_row = jnp.take_along_axis(g_row, idx, axis=-1)[..., 0]
    g_col = jnp.take_along_axis(g_col, idx, axis=-1)[..., 0]
    mag = jnp.take_along_axis(mag, idx, axis=-1)[..., 0]

    deg = jnp.rad2deg(jnp.arctan2(g_row, g_col)) % 180.0
    bin_idx = jnp.clip((deg / (180.0 / orientations)).astype(jnp.int32), 0, orientations - 1)
    votes = jax.nn.one_hot(bin_idx, orientations, dtype=jnp.float32) * mag[..., None]

    # cell histograms: mean over cell×cell pixels
    cells = jax.lax.reduce_window(
        votes, 0.0, jax.lax.add, (cell, cell, 1), (cell, cell, 1), "valid"
    ) / (cell * cell)  # [nch, ncw, O]

    # blocks: concat block×block cells, stride 1 (order matches skimage's
    # [row, col, orientation] flattening of the block)
    nch, ncw, O = cells.shape
    nbx, nby = nch - block + 1, ncw - block + 1
    rows = []
    for dr in range(block):
        cols = []
        for dc in range(block):
            cols.append(cells[dr : dr + nbx, dc : dc + nby])
        rows.append(jnp.concatenate(cols, axis=-1))
    blocks = jnp.concatenate(rows, axis=-1)  # [nbx, nby, block*block*O]

    # L2-Hys
    eps = 1e-5
    norm = jnp.sqrt(jnp.sum(blocks**2, axis=-1, keepdims=True) + eps**2)
    v = jnp.clip(blocks / norm, None, 0.2)
    norm2 = jnp.sqrt(jnp.sum(v**2, axis=-1, keepdims=True) + eps**2)
    return v / norm2


@functools.partial(jax.jit, static_argnames=("patch", "stride", "out_size"))
def lab_patch_features(
    img: jax.Array, patch: int = 64, stride: int = 8, out_size: int = 8
) -> jax.Array:
    """a/b LAB channels of patch×patch windows resized to out_size², scaled
    (x+128)/255 (reference hog.py:32-43). -> [nx, ny, 2*out_size*out_size]."""
    lab = rgb2lab(img)[..., 1:3]  # [H, W, 2]
    H, W, _ = lab.shape
    nx, ny = (H - patch) // stride + 1, (W - patch) // stride + 1
    # bilinear resample WITHOUT antialias (torch F.interpolate semantics):
    # output pixel k samples input at (k+0.5)*scale - 0.5 — precompute taps
    scale = patch / out_size
    pos = (jnp.arange(out_size) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, patch - 1)
    hi = jnp.clip(lo + 1, 0, patch - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)

    def resize_patch(p):  # [patch, patch, 2] -> [out, out, 2]
        rows = p[lo] * (1 - frac)[:, None, None] + p[hi] * frac[:, None, None]
        cols = rows[:, lo] * (1 - frac)[None, :, None] + rows[:, hi] * frac[None, :, None]
        return cols

    # extract patches via shifted slicing over the stride grid
    def per_offset(i, j):
        return jax.lax.dynamic_slice(lab, (i * stride, j * stride, 0), (patch, patch, 2))

    ii, jj = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), indexing="ij")
    patches = jax.vmap(jax.vmap(per_offset))(ii, jj)  # [nx, ny, patch, patch, 2]
    resized = jax.vmap(jax.vmap(resize_patch))(patches)  # [nx, ny, out, out, 2]
    # channel-major flatten (reference reshapes [K, 2, 8, 8] -> [K, 2*8*8])
    feats = (resized.transpose(0, 1, 4, 2, 3).reshape(nx, ny, 2 * out_size * out_size) + 128.0) / 255.0
    return feats


def hoglab_features(img: np.ndarray) -> np.ndarray:
    """Full per-image feature map (reference get_hoglab_single): [nx, ny, 2112]
    for 8-px grid positions. img: [H,W,3] uint8 or float in [0,1]."""
    arr = jnp.asarray(img, jnp.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    hog = hog_features(arr)
    lab = lab_patch_features(arr)
    nx = min(hog.shape[0], lab.shape[0])
    ny = min(hog.shape[1], lab.shape[1])
    out = jnp.concatenate([hog[:nx, :ny], lab[:nx, :ny]], axis=-1)
    # the reference transposes to (x, y, C) before caching (hog.py:45), and
    # its bbox convention indexes [x//8, y//8] — keep that layout
    return np.asarray(out.transpose(1, 0, 2))


def normalize_features(feats: np.ndarray) -> np.ndarray:
    """L2 per position (reference hog.py:82-88)."""
    n = np.linalg.norm(feats, axis=-1, keepdims=True)
    return feats / np.maximum(n, 1e-12)
