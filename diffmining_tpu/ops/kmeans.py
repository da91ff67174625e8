"""k-means on the MXU: distance matrices as matmuls, Lloyd via lax.while_loop.

TPU-native replacement for sklearn's Cython k-means which the reference uses
for cluster mining (reference: typicality/cluster.py:313 KMeans(32, rs=10))
and for the custom re-seeding variants in typicality/utils.py:279-684
(`KMeansBase`/`KMeansRe`). API mirrors sklearn's fit surface: n_init restarts,
k-means++ init, labels_/cluster_centers_/inertia_.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pairwise_sq_dists(x: jax.Array, c: jax.Array) -> jax.Array:
    """[N,D]×[K,D] -> [N,K] squared euclidean distances via one matmul."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1)
    xc = x @ c.T
    return jnp.maximum(x2 - 2.0 * xc + c2[None, :], 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def kmeanspp_init(key: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding (reference reimplements it at utils.py:303-359)."""
    n = x.shape[0]

    def body(carry, i):
        centers, min_d, key = carry
        key, sub = jax.random.split(key)
        probs = min_d / jnp.maximum(min_d.sum(), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        c = x[idx]
        centers = centers.at[i].set(c)
        d = jnp.sum((x - c[None]) ** 2, axis=1)
        return (centers, jnp.minimum(min_d, d), key), None

    key, sub = jax.random.split(key)
    first = x[jax.random.randint(sub, (), 0, n)]
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    min_d = jnp.sum((x - first[None]) ** 2, axis=1)
    (centers, _, _), _ = jax.lax.scan(body, (centers, min_d, key), jnp.arange(1, k))
    return centers


@functools.partial(jax.jit, static_argnames=("k", "max_iter"))
def lloyd(
    x: jax.Array, centers: jax.Array, k: int, max_iter: int = 300, tol: float = 1e-4
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lloyd iterations until center shift < tol. Returns (centers, labels, inertia).

    Empty clusters keep their previous center (sklearn relocates; with
    k-means++ restarts this is rare — the re-seeding variant handles it)."""

    def assign(c):
        d = pairwise_sq_dists(x, c)
        labels = jnp.argmin(d, axis=1)
        inertia = jnp.sum(jnp.min(d, axis=1))
        return labels, inertia

    def body(state):
        c, _, _, it = state
        labels, _ = assign(c)
        one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # [N,K]
        counts = one_hot.sum(axis=0)  # [K]
        sums = one_hot.T @ x  # [K,D] — MXU matmul
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), c)
        shift = jnp.sum((new_c - c) ** 2)
        return new_c, shift, labels, it + 1

    def cond(state):
        _, shift, _, it = state
        return jnp.logical_and(shift > tol, it < max_iter)

    init = (centers, jnp.asarray(jnp.inf, x.dtype), jnp.zeros(x.shape[0], jnp.int32), 0)
    c, _, _, _ = jax.lax.while_loop(cond, body, init)
    labels, inertia = assign(c)
    return c, labels, inertia


@dataclasses.dataclass
class KMeans:
    """sklearn-like facade: fit(X) sets labels_, cluster_centers_, inertia_."""

    n_clusters: int
    random_state: int = 0
    n_init: int = 10
    max_iter: int = 300
    tol: float = 1e-4

    def fit(self, x) -> "KMeans":
        x = jnp.asarray(np.asarray(x, dtype=np.float32))
        key = jax.random.PRNGKey(self.random_state)
        best = None
        for i in range(self.n_init):
            sub = jax.random.fold_in(key, i)
            init = kmeanspp_init(sub, x, self.n_clusters)
            c, labels, inertia = lloyd(x, init, self.n_clusters, self.max_iter, self.tol)
            inertia = float(inertia)
            if best is None or inertia < best[0]:
                best = (inertia, c, labels)
        self.inertia_, c, labels = best[0], best[1], best[2]
        self.cluster_centers_ = np.asarray(c)
        self.labels_ = np.asarray(labels)
        return self

    def fit_predict(self, x) -> np.ndarray:
        return self.fit(x).labels_


@dataclasses.dataclass
class KMeansSplitReassign(KMeans):
    """Port of the reference's pure-numpy `KMeans(KMeansBase)` with
    split_reassign (reference typicality/utils.py:617-684; unused by the
    shipped pipeline — sklearn KMeans is what cluster.py:313 calls — but part
    of the public surface). Faithful semantics, including the quirk that
    `split_reassign` always returns False, so after Lloyd converges the small
    clusters (< k_min·N members) are re-seeded ONCE at the biggest cluster's
    centroid + N(0, 0.01·sigma) noise and points are re-assigned WITHOUT
    another Lloyd pass."""

    k_min: float = 0.01
    n_init: int = 1  # the reference variant runs a single random init

    def fit(self, x) -> "KMeansSplitReassign":
        x_np = np.asarray(x, dtype=np.float32)
        x_j = jnp.asarray(x_np)
        n, k = x_np.shape[0], self.n_clusters
        rng = np.random.RandomState(self.random_state)
        init = x_j[jnp.asarray(rng.choice(n, k, replace=False))]
        c, labels, inertia = lloyd(x_j, init, k, self.max_iter, self.tol)
        centers, labels = np.array(c), np.asarray(labels)  # np.array: writable copy
        counts = np.bincount(labels, minlength=k)
        small = np.where(counts < self.k_min * n)[0]
        if len(small) > 0:
            big = int(np.argmax(counts))
            sigma = x_np[labels == big].std(axis=0)
            for i in small:
                centers[i] = centers[big] + rng.normal(0.0, 0.01 * sigma, centers[big].shape)
            d = np.asarray(pairwise_sq_dists(x_j, jnp.asarray(centers)))
            labels = d.argmin(axis=1)
            inertia = d.min(axis=1).sum()
        self.cluster_centers_, self.labels_, self.inertia_ = centers, labels, float(inertia)
        return self


@dataclasses.dataclass
class KMeansRe(KMeans):
    """Re-seeding variant of the reference's `KMeansRe` (utils.py:458-540):
    clusters smaller than k_min_frac·N/K are re-seeded near the biggest
    cluster's points and Lloyd is re-run, up to `reseed_rounds` times."""

    k_min_frac: float = 0.25
    reseed_rounds: int = 3

    def fit(self, x) -> "KMeansRe":
        super().fit(x)
        x_j = jnp.asarray(np.asarray(x, dtype=np.float32))
        n, k = x_j.shape[0], self.n_clusters
        min_size = max(1, int(self.k_min_frac * n / k))
        key = jax.random.PRNGKey(self.random_state + 1)
        for r in range(self.reseed_rounds):
            counts = np.bincount(self.labels_, minlength=k)
            small = np.where(counts < min_size)[0]
            if len(small) == 0:
                break
            big = int(np.argmax(counts))
            big_points = np.where(self.labels_ == big)[0]
            centers = self.cluster_centers_.copy()
            for j, cl in enumerate(small):
                sub = jax.random.fold_in(key, r * k + j)
                pick = int(jax.random.randint(sub, (), 0, len(big_points)))
                centers[cl] = np.asarray(x)[big_points[pick]]
            c, labels, inertia = lloyd(x_j, jnp.asarray(centers), k, self.max_iter, self.tol)
            self.cluster_centers_, self.labels_, self.inertia_ = (
                np.asarray(c), np.asarray(labels), float(inertia),
            )
        return self
