"""Linear SVM solver on device.

TPU-native replacement for sklearn's libsvm SVC(C=0.1, kernel='linear') used
by the Doersch baseline's iterative detector training (reference:
doersch/doersch.py:66-79 `train_svm`). Solves the primal soft-margin problem

    min_w,b  0.5·||w||² + C·Σ max(0, 1 − y(w·x + b))

by full-batch subgradient descent with Adam (the datasets are ~25k×2112 — one
matmul per step on the MXU). Exact libsvm duals and this primal solve agree to
the tolerance that matters here (the detectors' top-k rankings); the oracle is
cluster purity, not coefficient equality.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@functools.partial(jax.jit, static_argnames=("steps",))
def _fit(X: jax.Array, y: jax.Array, sample_mask: jax.Array, C: float, steps: int, lr: float):
    n, d = X.shape

    def loss_fn(params):
        w, b = params
        margins = 1.0 - y * (X @ w + b)
        hinge = jnp.sum(jnp.maximum(margins, 0.0) * sample_mask)
        return 0.5 * jnp.sum(w * w) + C * hinge

    tx = optax.adam(lr)
    params = (jnp.zeros((d,), jnp.float32), jnp.asarray(0.0))
    state = tx.init(params)

    def step(carry, _):
        params, state = carry
        g = jax.grad(loss_fn)(params)
        updates, state = tx.update(g, state)
        return (optax.apply_updates(params, updates), state), None

    (params, _), _ = jax.lax.scan(step, (params, state), None, length=steps)
    return params


def fit_linear_svm(
    X: np.ndarray, y: np.ndarray, C: float = 0.1, steps: int = 400, lr: float = 0.05,
    sample_mask: np.ndarray | None = None,
) -> Tuple[np.ndarray, float]:
    """X [N,D], y [N] in {-1,+1} -> (w [D], b). sample_mask excludes padding."""
    Xj = jnp.asarray(np.asarray(X, np.float32))
    yj = jnp.asarray(np.asarray(y, np.float32))
    mj = jnp.asarray(
        np.ones(len(y), np.float32) if sample_mask is None else np.asarray(sample_mask, np.float32)
    )
    w, b = _fit(Xj, yj, mj, float(C), steps, float(lr))
    return np.asarray(w), float(b)


def decision_function(X: np.ndarray, w: np.ndarray, b: float = 0.0) -> np.ndarray:
    return np.asarray(X, np.float32) @ np.asarray(w, np.float32) + b


def train_svm(X, split, max_samples, C: float = 0.1):
    """Reference train_svm semantics (doersch.py:66-79): X = positives +
    hard-negatives + negatives in order; returns (w, new hard negatives =
    misclassified negatives sorted by score, capped)."""
    len_p, len_hn, len_n = split
    X = np.stack(X, axis=0).astype(np.float32)
    y = np.asarray([1.0] * len_p + [-1.0] * (len_hn + len_n), np.float32)
    w, b = fit_linear_svm(X, y, C=C)
    scores = decision_function(X[len_p + len_hn :], w, b)
    idx = np.where(scores > 0)[0]
    sorted_idx = np.argsort(-scores[idx])
    hard = X[idx[sorted_idx][:max_samples] + len_p + len_hn]
    return w, hard.tolist()
