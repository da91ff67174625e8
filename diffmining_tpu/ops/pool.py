"""Patch scoring ops: box-average pooling, bilinear upsampling, non-overlap
suppression, top-k.

TPU-native replacement for the reference's torch AvgPool2d/interpolate pipeline
(reference: diffmining/typicality/utils.py:74-102, cluster.py:125-137). The
stride-1 box filter runs as `lax.reduce_window` on device; greedy non-overlap
suppression is a host op (tiny inputs: top-k candidates per image) with a C++
fast path (native/boxops) when built.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("kx", "ky"))
def box_pool(x: jax.Array, kx: int, ky: int) -> jax.Array:
    """Stride-1 VALID average pooling over the last two spatial dims.

    x: [..., H, W] -> [..., H-kx+1, W-ky+1]. Equivalent to the reference's
    `pool` (AvgPool2d((kx,ky), stride=1), utils.py:74-80). fp32 accumulation.
    """
    if kx == 1 and ky == 1:
        return x
    nd = x.ndim
    window = (1,) * (nd - 2) + (kx, ky)
    strides = (1,) * nd
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, window, strides, "valid"
    )
    return summed / (kx * ky)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def upsample_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear resize of the last two dims to (h, w), matching torch
    `interpolate(mode='bilinear', align_corners=False)` semantics — which is
    jax.image.resize 'linear'."""
    out_shape = x.shape[:-2] + (h, w)
    return jax.image.resize(x.astype(jnp.float32), out_shape, method="linear")


@functools.partial(jax.jit, static_argnames=("kx", "ky", "h", "w"))
def typicality_map(loss_grid: jax.Array, h: int, w: int, kx: int = 64, ky: int = 64) -> jax.Array:
    """Reference `Cluster.load_typicality` (cluster.py:125-137) as one fused op.

    loss_grid: [N, n_cond, C, hl, wl] fp16 (reference .npy layout, cond at
    index 0, null at index 1). Returns the patch-score map
    [h-kx+1, w-ky+1] fp32 where score = mean_n box(L_null) − box(L_cond)
    (the reference computes pool(cond)−pool(null) then negates).
    """
    dm = loss_grid.astype(jnp.float32).mean(axis=2)  # mean over latent channels
    dm = upsample_bilinear(dm, h, w)  # [N, n_cond, h, w]
    pooled = box_pool(dm, kx, ky)  # [N, n_cond, h', w']
    return (pooled[:, 1] - pooled[:, 0]).mean(axis=0)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def pixel_typicality_map(loss_grid: jax.Array, h: int, w: int) -> jax.Array:
    """Per-pixel (unpooled) typicality: mean_n[L_null − L_cond] upsampled —
    the reference's `rank_images`/`load_typicality_norm` map
    (cluster.py:112-123, 512-528)."""
    dm = loss_grid.astype(jnp.float32).mean(axis=2)
    dm = upsample_bilinear(dm, h, w)
    return (dm[:, 1] - dm[:, 0]).mean(axis=0)


def get_non_overlapping(
    boxes: np.ndarray, scores: np.ndarray, k: int
) -> np.ndarray:
    """Greedy suppression: pick highest-score box, drop all overlapping, repeat
    (reference utils.py:94-102 — rectangles overlap iff they intersect).

    boxes: [M, 4] (x_start, y_start, x_end, y_end); scores: [M] (pre-sorted or
    not — we sort descending). Returns indices into boxes, at most k.
    """
    try:
        from diffmining_tpu.native.boxops import non_overlap_suppress

        return non_overlap_suppress(boxes, scores, k)
    except Exception:
        pass
    order = np.argsort(-scores, kind="stable")
    picked = []
    bx = boxes[order]
    alive = np.ones(len(order), dtype=bool)
    for i in range(len(order)):
        if not alive[i]:
            continue
        picked.append(order[i])
        if len(picked) >= k:
            break
        b = bx[i]
        overlap = (
            (bx[:, 0] <= b[2]) & (bx[:, 2] >= b[0]) & (bx[:, 1] <= b[3]) & (bx[:, 3] >= b[1])
        )
        alive &= ~overlap
    return np.asarray(picked, dtype=np.int64)


def top_patches(
    score_map: np.ndarray, kx: int, ky: int, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k non-overlapping kx×ky patches of a score map.

    Returns (boxes [k,4] as x_start,y_start,x_end,y_end with the reference's
    row-major convention, scores [k]). Equivalent to building the full (i,j)
    DataFrame, sorting by D and greedy-suppressing (cluster.py:192-204) —
    but without materializing a DataFrame per pixel.
    """
    h, w = score_map.shape
    flat = score_map.ravel()
    # suppression kills all overlapping boxes, so only local maxima in a
    # (kx, ky) neighborhood can ever be picked — prefilter to those
    order = np.argsort(-flat, kind="stable")
    # cap candidates: k picks can suppress at most k*(2kx-1)*(2ky-1) boxes
    cap = min(len(order), max(k * 8, 4096))
    cand = order[:cap]
    xs, ys = np.divmod(cand, w)
    boxes = np.stack([xs, ys, xs + kx, ys + ky], axis=1)
    idx = get_non_overlapping(boxes, flat[cand], k)
    # fallback: if the capped candidate set exhausted before k picks, rerun full
    if len(idx) < k and cap < len(order):
        xs, ys = np.divmod(order, w)
        boxes = np.stack([xs, ys, xs + kx, ys + ky], axis=1)
        idx = get_non_overlapping(boxes, flat[order], k)
        return boxes[idx], flat[order][idx]
    return boxes[idx], flat[cand][idx]


def filter_patch(arr: np.ndarray, black_threshold: float = 30, white_threshold: float = 225) -> bool:
    """Reject near-black/near-white patches (reference utils.py:104-109).
    arr: uint8 RGB or grayscale array."""
    if arr.ndim == 3:
        gray = arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114
    else:
        gray = arr
    m = float(np.mean(gray))
    return black_threshold < m < white_threshold


def gauss_kernel_1d(sigma: float, ksize: int) -> np.ndarray:
    r = ksize // 2
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2 * sigma**2))
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("sigma", "ksize"))
def gaussian_blur(dm: jax.Array, sigma: float = 32.0, ksize: int = 127) -> jax.Array:
    """Separable 2-D Gaussian blur of an [H, W] map as two device-side 1-D
    convolutions in one jit, reflect padding (torchvision GaussianBlur /
    scipy gaussian_filter(mode='reflect') semantics). Used by the X-ray
    spatialization option (reference xray/compute.py:165,207) and the
    typicality-as-alpha overlays (reference utils.py:204); pinned against a
    host numpy implementation in test_xray.py."""
    r = ksize // 2
    k = jnp.asarray(gauss_kernel_1d(sigma, ksize), jnp.float32)
    x = jnp.pad(dm.astype(jnp.float32), ((r, r), (r, r)), mode="reflect")
    x = x[None, :, :, None]  # NHWC
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, k.reshape(1, ksize, 1, 1), (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, k.reshape(ksize, 1, 1, 1), (1, 1), "VALID", dimension_numbers=dn)
    return x[0, :, :, 0]
