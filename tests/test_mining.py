"""Mining op tests: pooling, suppression, top-k, k-means (SURVEY.md §4b)."""
import numpy as np
import jax.numpy as jnp
import pytest

from diffmining_tpu.ops.kmeans import KMeans, KMeansRe
from diffmining_tpu.ops.pool import (
    box_pool,
    filter_patch,
    get_non_overlapping,
    top_patches,
    typicality_map,
    upsample_bilinear,
)


def test_box_pool_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 10, 12).astype(np.float32)
    got = np.asarray(box_pool(jnp.asarray(x), 4, 5))
    assert got.shape == (2, 3, 7, 8)
    for i in range(7):
        for j in range(8):
            want = x[:, :, i : i + 4, j : j + 5].mean(axis=(2, 3))
            np.testing.assert_allclose(got[:, :, i, j], want, rtol=1e-5)


def test_box_pool_k1_identity():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 1, 5, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(box_pool(x, 1, 1)), np.asarray(x))


def test_typicality_map_sign_convention():
    """score = mean box(L_null) − box(L_cond): a region where the conditional
    loss drops below the null loss must score positive."""
    N, hl, wl = 4, 8, 8
    grid = np.ones((N, 2, 4, hl, wl), dtype=np.float16)
    grid[:, 0, :, :4, :4] = 0.2  # cond loss low in top-left quadrant
    m = np.asarray(typicality_map(jnp.asarray(grid), 32, 32, 8, 8))
    assert m.shape == (25, 25)
    assert m[0, 0] > 0.5
    assert abs(m[-1, -1]) < 1e-3


def test_get_non_overlapping_vs_bruteforce():
    rng = np.random.RandomState(2)
    for _ in range(5):
        n = 40
        xs = rng.randint(0, 30, n)
        ys = rng.randint(0, 30, n)
        boxes = np.stack([xs, ys, xs + 8, ys + 8], axis=1)
        scores = rng.rand(n).astype(np.float32)
        idx = get_non_overlapping(boxes, scores, 5)
        # brute force greedy (the reference's DataFrame loop, utils.py:94-102)
        order = np.argsort(-scores, kind="stable")
        picked = []
        rem = list(order)
        while rem and len(picked) < 5:
            i = rem[0]
            picked.append(i)
            b = boxes[i]
            rem = [
                j for j in rem
                if not (boxes[j][0] <= b[2] and boxes[j][2] >= b[0] and boxes[j][1] <= b[3] and boxes[j][3] >= b[1])
            ]
        np.testing.assert_array_equal(idx, picked)


def test_top_patches_no_overlap_and_order():
    rng = np.random.RandomState(3)
    score = rng.rand(40, 50).astype(np.float32)
    boxes, scores = top_patches(score, 8, 8, 5)
    assert len(boxes) == 5
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            overlap = a[0] <= b[2] and a[2] >= b[0] and a[1] <= b[3] and a[3] >= b[1]
            assert not overlap
    # the global max is always picked first
    am = np.unravel_index(np.argmax(score), score.shape)
    assert tuple(boxes[0][:2]) == am


def test_filter_patch():
    assert not filter_patch(np.zeros((8, 8, 3), dtype=np.uint8))
    assert not filter_patch(np.full((8, 8, 3), 255, dtype=np.uint8))
    assert filter_patch(np.full((8, 8, 3), 128, dtype=np.uint8))


def test_kmeans_recovers_separated_clusters():
    rng = np.random.RandomState(0)
    centers = np.array([[0, 0], [10, 10], [-10, 10]], dtype=np.float32)
    x = np.concatenate([c + 0.1 * rng.randn(50, 2).astype(np.float32) for c in centers])
    km = KMeans(n_clusters=3, random_state=10, n_init=4).fit(x)
    labels = km.labels_
    # each ground-truth group maps to exactly one cluster
    for g in range(3):
        assert len(np.unique(labels[g * 50 : (g + 1) * 50])) == 1
    assert len(np.unique([labels[0], labels[50], labels[100]])) == 3
    assert km.inertia_ < 50 * 3 * 0.1


def test_kmeans_sklearn_parity():
    """Activates the day sklearn exists in-image: our MXU Lloyd must reach
    the same objective (inertia) as sklearn.cluster.KMeans on blobs
    (reference cluster.py:313)."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")

    rng = np.random.RandomState(0)
    X = np.concatenate([rng.randn(60, 6) + c for c in (-6, 0, 6)]).astype(np.float32)
    ours = KMeans(n_clusters=3, random_state=10).fit(X)
    ref = sklearn_cluster.KMeans(n_clusters=3, random_state=10, n_init=10).fit(X)
    assert ours.inertia_ <= ref.inertia_ * 1.02
    # identical partitions up to label permutation on well-separated blobs
    from collections import Counter

    pairs = Counter(zip(ours.labels_.tolist(), ref.labels_.tolist()))
    assert len(pairs) == 3


def test_kmeans_deterministic():
    rng = np.random.RandomState(1)
    x = rng.randn(100, 8).astype(np.float32)
    a = KMeans(n_clusters=4, random_state=10, n_init=2).fit(x)
    b = KMeans(n_clusters=4, random_state=10, n_init=2).fit(x)
    np.testing.assert_array_equal(a.labels_, b.labels_)
    np.testing.assert_allclose(a.cluster_centers_, b.cluster_centers_)


def test_kmeans_re_fills_small_clusters():
    rng = np.random.RandomState(2)
    # one dense blob + a few outliers: plain kmeans leaves tiny clusters
    x = np.concatenate([rng.randn(200, 2), 50 + rng.randn(2, 2)]).astype(np.float32)
    km = KMeansRe(n_clusters=8, random_state=10, n_init=2, k_min_frac=0.5).fit(x)
    counts = np.bincount(km.labels_, minlength=8)
    # after reseeding, no cluster of size < 2 should persist among the blob
    assert counts.max() < 200  # the big blob got split


def test_kmeans_split_reassign_reseeds_small_clusters():
    from diffmining_tpu.ops.kmeans import KMeansSplitReassign

    rng = np.random.RandomState(3)
    # dense blob + 2 far outliers -> some clusters end up tiny (< k_min*N)
    x = np.concatenate([rng.randn(300, 2), 100 + rng.randn(2, 2)]).astype(np.float32)
    km = KMeansSplitReassign(n_clusters=6, random_state=32, k_min=0.05).fit(x)
    assert km.labels_.shape == (302,)
    assert km.cluster_centers_.shape == (6, 2)
    # reseeded centers sit near the biggest cluster: every center except the
    # outlier one must be inside the blob's range
    counts = np.bincount(km.labels_, minlength=6)
    assert counts.sum() == 302
    # determinism
    km2 = KMeansSplitReassign(n_clusters=6, random_state=32, k_min=0.05).fit(x)
    np.testing.assert_array_equal(km.labels_, km2.labels_)


def test_upsample_bilinear_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(4).randn(2, 3, 5, 7).astype(np.float32)
    got = np.asarray(upsample_bilinear(jnp.asarray(x), 15, 21))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), (15, 21), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vcat_hcat_sizes():
    """vcat must size to the WIDEST row (a first-row-width canvas clipped any
    wider later row, e.g. Doersch detector strips with more detections)."""
    from PIL import Image

    from diffmining_tpu.utils.figures import hcat, vcat

    rows = [
        hcat([Image.new("RGB", (10, 10)) for _ in range(2)]),
        hcat([Image.new("RGB", (10, 10)) for _ in range(5)]),
    ]
    out = vcat(rows, vertical_spacing=2)
    assert out.size == (50, 22)
