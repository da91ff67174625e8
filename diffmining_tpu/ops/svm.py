"""Linear SVM solver on device.

TPU-native replacement for sklearn's libsvm SVC(C=0.1, kernel='linear') used
by the Doersch baseline's iterative detector training (reference:
doersch/doersch.py:66-79 `train_svm`). Solves the primal soft-margin problem

    min_w,b  0.5·||w||² + C·Σ max(0, 1 − y(w·x + b))

by full-batch subgradient descent with Adam under a cosine-decayed lr (the
datasets are ~25k×2112 — one matmul per step on the MXU). The decay is
load-bearing: with a CONSTANT lr the iterate orbits the optimum at a radius
set by the lr — measured 93% objective gap at the production-shaped problem
(2k×2112 real HOG cells, 100:1900 imbalance) vs 0.14% with the decay, same
step count (test_doersch.py::test_svm_gap_at_production_shape).

Optimality-gap evidence, two instruments:
- vs the exact in-repo SMO dual solver (fit_svm_smo): ≤5% objective gap +
  ≥98% decision agreement asserted at a small dense problem (120×10) AND a
  production-shaped 2k×2112 real-HOG subsample (the SMO oracle is O(n²), so
  2k is as far as it goes).
- a weak-duality certificate (duality_gap) that needs NO oracle: a
  dual-feasible α built from the primal margins lower-bounds the optimum in
  O(n·d), so the gap is ASSERTED at the full 25k×2112 production shape —
  measured 0.57% relative (and 0.22% at 2k where the true SMO gap is 0.14%,
  i.e. the certificate is tight). test_doersch.py pins both.
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

    # cosine lr decay: constant-lr Adam stalls ~93% above the optimum on
    # production-shaped problems (module docstring); decaying to 0 converges
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
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


@functools.partial(jax.jit, static_argnames=("steps",))
def _fit_batch(P, Pm, HN, HNm, NEG, NEGm, C: float, steps: int, lr: float):
    J, _, D = P.shape

    def loss_fn(params):
        W, b = params  # [J, D], [J]
        # positives (+1): hinge(1 - (x·w + b))
        mp = 1.0 - (jnp.einsum("jpd,jd->jp", P, W) + b[:, None])
        # per-detector hard negatives (-1), padded + masked
        mh = 1.0 + (jnp.einsum("jhd,jd->jh", HN, W) + b[:, None])
        # SHARED negative pool (-1): ONE [M, D] x [D, J] matmul on the MXU
        mn = 1.0 + (NEG @ W.T + b[None, :])  # [M, J]
        hinge = (
            jnp.sum(jnp.maximum(mp, 0.0) * Pm)
            + jnp.sum(jnp.maximum(mh, 0.0) * HNm)
            + jnp.sum(jnp.maximum(mn, 0.0) * NEGm.T)
        )
        return 0.5 * jnp.sum(W * W) + C * hinge

    # summing independent per-detector objectives keeps the solve exactly
    # per-detector: Adam is elementwise and the parameter blocks are disjoint
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    params = (jnp.zeros((J, D), jnp.float32), jnp.zeros((J,), jnp.float32))
    state = tx.init(params)

    def step(carry, _):
        params, state = carry
        g = jax.grad(loss_fn)(params)
        updates, state = tx.update(g, state)
        return (optax.apply_updates(params, updates), state), None

    (params, _), _ = jax.lax.scan(step, (params, state), None, length=steps)
    W, b = params
    # final decision scores over the shared pool — computed here so the
    # caller's hard-negative mining needs no second 200 MB upload
    neg_scores = NEG @ W.T + b[None, :]  # [M, J]
    return params, neg_scores


def fit_linear_svm_batch(
    P: np.ndarray, P_mask: np.ndarray,
    HN: np.ndarray, HN_mask: np.ndarray,
    NEG: np.ndarray, NEG_mask: np.ndarray,
    C: float = 0.1, steps: int = 400, lr: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """J independent soft-margin SVMs sharing one negative pool, solved in ONE
    jitted program (the Doersch iterative round's hot path, baselines/
    doersch.py): P [J,p,D] padded positives (+1) with mask [J,p], HN [J,h,D]
    padded per-detector hard negatives (-1) with mask [J,h], NEG [M,D] the
    shared fold negative pool (-1) with per-detector row mask [J,M]. Returns
    (W [J,D], b [J], neg_scores [M,J]). Exactly equivalent to J calls of
    fit_linear_svm on the stacked rows (test_doersch.py pins it) — the point
    is dispatch/transfer amortization: the legacy path shipped the ~200 MB
    negative pool to the device once PER DETECTOR."""
    params, neg_scores = _fit_batch(
        jnp.asarray(np.asarray(P, np.float32)), jnp.asarray(np.asarray(P_mask, np.float32)),
        jnp.asarray(np.asarray(HN, np.float32)), jnp.asarray(np.asarray(HN_mask, np.float32)),
        jnp.asarray(np.asarray(NEG, np.float32)), jnp.asarray(np.asarray(NEG_mask, np.float32)),
        float(C), int(steps), float(lr),
    )
    return np.asarray(params[0]), np.asarray(params[1]), np.asarray(neg_scores)


def duality_gap(
    X: np.ndarray, y: np.ndarray, w: np.ndarray, b: float, C: float
) -> Tuple[float, float, float, float]:
    """Optimality certificate for (w, b) with NO exact-solver oracle.

    Builds a dual-feasible point for the soft-margin dual
    (max_α Σα − ½‖Σ α·y·x‖², 0 ≤ α ≤ C, Σ α·y = 0) from the primal
    margins — complementary slackness puts the optimal α at C on
    margin-violating points and 0 on strictly-satisfied ones — then restores
    the equality constraint by shaving α from the least-violating active
    points on the heavier side. Weak duality makes D(α) a lower bound on the
    primal optimum for ANY feasible α, so

        gap = P(w, b) − D(α)  ≥  P(w, b) − P*

    in O(n·d): certifiable at the full ~25k×2112 production solve where the
    O(n²) SMO oracle cannot go (the extrapolation caveat in the module
    docstring; asserted at scale in test_doersch.py). Returns
    (gap, relative_gap, primal, dual).
    """
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    w = np.asarray(w, np.float64)
    slack = 1.0 - y * (X @ w + b)
    alpha = np.where(slack > 0, C, 0.0)
    resid = float(alpha @ y)  # Σ α·y, to be shaved to 0
    side = np.sign(resid)
    if side:
        # shave the +C blocks on the heavier side, least-violating first
        # (those are the points whose true α is most plausibly interior)
        idx = np.where((alpha > 0) & (y == side))[0]
        idx = idx[np.argsort(slack[idx])]
        need = abs(resid)
        for i in idx:
            take = min(alpha[i], need)
            alpha[i] -= take
            need -= take
            if need <= 0:
                break
    w_alpha = (alpha * y) @ X
    dual = float(alpha.sum() - 0.5 * (w_alpha @ w_alpha))
    primal = primal_objective(X, y, w, b, C)
    gap = primal - dual
    return gap, gap / max(primal, 1e-12), primal, dual


def primal_objective(X: np.ndarray, y: np.ndarray, w: np.ndarray, b: float, C: float) -> float:
    """0.5·||w||² + C·Σ hinge — the quantity both solvers minimize."""
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    w = np.asarray(w, np.float64)
    hinge = np.maximum(0.0, 1.0 - y * (X @ w + b)).sum()
    return float(0.5 * (w @ w) + C * hinge)


def fit_svm_smo(
    X: np.ndarray, y: np.ndarray, C: float = 0.1, tol: float = 1e-5,
    max_passes: int = 50, seed: int = 0,
) -> Tuple[np.ndarray, float, np.ndarray]:
    """EXACT small-problem reference solver: Platt's SMO on the soft-margin
    dual (the same QP libsvm's SVC solves, reference doersch.py:71-79). O(n²)
    kernel matrix — intended for ≤ a few hundred points, as the in-repo oracle
    that bounds the primal-Adam solver's optimality gap numerically
    (test_doersch.py); returns (w, b, alpha)."""
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    n = len(y)
    K = X @ X.T
    alpha = np.zeros(n)
    b = 0.0
    if n < 2:
        # SMO updates pairs; with one point the dual optimum is the single
        # box-constrained coordinate: alpha = C if the (margin-violating)
        # point is inside the margin of the zero solution, giving w = C·y·x
        if n == 1 and K[0, 0] > 0:
            alpha[0] = min(C, 1.0 / K[0, 0])
        w = (alpha * y) @ X
        return w, float(y[0]) * max(0.0, 1.0 - alpha[0] * K[0, 0]) if n else 0.0, alpha
    rng = np.random.RandomState(seed)
    passes = 0
    while passes < max_passes:
        changed = 0
        for i in range(n):
            Ei = float((alpha * y) @ K[:, i] + b - y[i])
            if not ((y[i] * Ei < -tol and alpha[i] < C) or (y[i] * Ei > tol and alpha[i] > 0)):
                continue
            j = rng.randint(n - 1)
            j = j + (j >= i)
            Ej = float((alpha * y) @ K[:, j] + b - y[j])
            ai, aj = alpha[i], alpha[j]
            if y[i] != y[j]:
                L, H = max(0.0, aj - ai), min(C, C + aj - ai)
            else:
                L, H = max(0.0, ai + aj - C), min(C, ai + aj)
            if L == H:
                continue
            eta = 2.0 * K[i, j] - K[i, i] - K[j, j]
            if eta >= 0:
                continue
            alpha[j] = float(np.clip(aj - y[j] * (Ei - Ej) / eta, L, H))
            if abs(alpha[j] - aj) < 1e-9:
                continue
            alpha[i] = ai + y[i] * y[j] * (aj - alpha[j])
            b1 = b - Ei - y[i] * (alpha[i] - ai) * K[i, i] - y[j] * (alpha[j] - aj) * K[i, j]
            b2 = b - Ej - y[i] * (alpha[i] - ai) * K[i, j] - y[j] * (alpha[j] - aj) * K[j, j]
            if 0 < alpha[i] < C:
                b = b1
            elif 0 < alpha[j] < C:
                b = b2
            else:
                b = (b1 + b2) / 2.0
            changed += 1
        passes = passes + 1 if changed == 0 else 0
    w = (alpha * y) @ X
    return w, float(b), alpha


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
