"""Masked k-means vs sklearn quality oracle."""

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import KMeans

from partdistillation_tpu.ops.kmeans import assign_labels, masked_kmeans


def blobs(n_per, k, d, spread, seed):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 10
    pts = np.concatenate([centers[i] + rng.randn(n_per, d) * spread for i in range(k)])
    labels = np.repeat(np.arange(k), n_per)
    return pts.astype(np.float32), labels, centers


def inertia(x, centroids):
    d = ((x[:, None] - centroids[None]) ** 2).sum(-1)
    return d.min(-1).sum()


def test_recovers_separated_blobs():
    x, true_labels, _ = blobs(50, 4, 8, spread=0.1, seed=0)
    mask = np.ones(len(x), bool)
    cents, labels = masked_kmeans(jnp.asarray(x), jnp.asarray(mask), 4, jax.random.PRNGKey(0))
    labels = np.asarray(labels)
    # each true cluster maps to exactly one predicted cluster
    for i in range(4):
        assert len(set(labels[true_labels == i])) == 1
    assert len(set(labels.tolist())) == 4


def test_inertia_close_to_sklearn():
    x, _, _ = blobs(80, 5, 16, spread=2.0, seed=1)
    mask = np.ones(len(x), bool)
    cents, _ = masked_kmeans(jnp.asarray(x), jnp.asarray(mask), 5, jax.random.PRNGKey(1), iters=50)
    sk = KMeans(n_clusters=5, n_init=10, random_state=0).fit(x)
    ours = inertia(x, np.asarray(cents))
    theirs = inertia(x, sk.cluster_centers_)
    assert ours <= theirs * 1.15, (ours, theirs)


def test_mask_excludes_outliers():
    x, _, _ = blobs(40, 3, 4, spread=0.1, seed=2)
    poison = np.full((30, 4), 1e3, np.float32)
    allx = np.concatenate([x, poison])
    mask = np.concatenate([np.ones(len(x), bool), np.zeros(30, bool)])
    cents, _ = masked_kmeans(jnp.asarray(allx), jnp.asarray(mask), 3, jax.random.PRNGKey(0))
    # no centroid anywhere near the poison rows
    assert np.abs(np.asarray(cents)).max() < 100


def test_assign_labels_metrics():
    cents = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    x = np.array([[2.0, 0.1], [0.1, 2.0]], np.float32)
    l2 = np.asarray(assign_labels(jnp.asarray(x), jnp.asarray(cents), "l2"))
    dot = np.asarray(assign_labels(jnp.asarray(x), jnp.asarray(cents), "dot"))
    np.testing.assert_array_equal(l2, [0, 1])
    np.testing.assert_array_equal(dot, [0, 1])
    # works on image-shaped input
    img = np.tile(x[None], (3, 1, 1)).reshape(3, 2, 2)
    out = np.asarray(assign_labels(jnp.asarray(img), jnp.asarray(cents), "l2"))
    assert out.shape == (3, 2)


def test_batched_vmap():
    xs, masks = [], []
    for s in range(4):
        x, _, _ = blobs(30, 2, 4, spread=0.2, seed=s)
        xs.append(x)
        masks.append(np.ones(len(x), bool))
    xs = jnp.asarray(np.stack(xs))
    masks = jnp.asarray(np.stack(masks))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    f = jax.vmap(lambda x, m, k: masked_kmeans(x, m, 2, k))
    cents, labels = jax.jit(f)(xs, masks, keys)
    assert cents.shape == (4, 2, 4)
    assert np.isfinite(np.asarray(cents)).all()
