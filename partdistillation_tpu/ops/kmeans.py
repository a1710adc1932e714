"""Batched masked k-means on device (jit/vmap-able).

Replaces the reference's per-image sklearn KMeans on CPU-copied features
(proposal_generation_model.py:202-210: k=4 "superpixel" clustering of masked
backbone features; evaluation/clustering_module.py:43-70: per-object-class k=8
clustering of decoder features on rank 0). On TPU the distance computations are
(N, D) x (D, k) matmuls on the MXU inside a `lax.fori_loop` of Lloyd
iterations, vmappable over a batch of images — no device->host copy per image.

Padding convention: a fixed-capacity point set (N, D) with a validity mask;
invalid rows never contribute to assignments or centroid updates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["masked_kmeans", "assign_labels"]


def _pairwise_sqdist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """(N, D), (K, D) -> (N, K) squared euclidean distances (MXU-friendly)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    cc = jnp.sum(c * c, axis=-1)
    xc = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    return xx + cc[None, :] - 2.0 * xc


def _kmeans_pp_init(x: jnp.ndarray, mask: jnp.ndarray, k: int, key: jax.Array) -> jnp.ndarray:
    """k-means++ seeding restricted to valid rows."""
    n = x.shape[0]
    logits_base = jnp.where(mask, 0.0, -jnp.inf)

    k0, key = jax.random.split(key)
    first = jax.random.categorical(k0, logits_base)
    centroids = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        centroids, min_d, key = carry
        d_new = jnp.sum((x - centroids[i - 1][None, :]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d_new)
        kk, key = jax.random.split(key)
        # sample proportional to min squared distance among valid rows
        logp = jnp.where(mask & (min_d > 0), jnp.log(jnp.maximum(min_d, 1e-30)), -jnp.inf)
        # all-zero distances (degenerate): fall back to uniform over valid
        logp = jnp.where(jnp.all(jnp.isneginf(logp)), logits_base, logp)
        idx = jax.random.categorical(kk, logp)
        centroids = centroids.at[i].set(x[idx])
        return centroids, min_d, key

    min_d0 = jnp.where(mask, jnp.float32(jnp.inf), 0.0)
    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids, min_d0, key))
    return centroids


def masked_kmeans(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    key: jax.Array,
    iters: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means over the valid rows of `x`.

    Args:
      x: (N, D) points (padded).
      mask: (N,) bool validity.
      k: number of clusters (static).
      key: PRNG key (k-means++ init).
      iters: Lloyd iterations (static).

    Returns:
      (centroids (k, D) float32, labels (N,) int32 — argmin centroid per row,
      defined for all rows including invalid ones).
    """
    x = x.astype(jnp.float32)
    centroids = _kmeans_pp_init(x, mask, k, key)
    valid = mask.astype(jnp.float32)[:, None]

    def lloyd(_, centroids):
        d = _pairwise_sqdist(x, centroids)  # (N, K)
        labels = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32) * valid  # (N, K)
        counts = onehot.sum(0)  # (K,)
        sums = jnp.einsum("nk,nd->kd", onehot, x)
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        # empty clusters keep their previous centroid
        return jnp.where(counts[:, None] > 0, new_c, centroids)

    centroids = jax.lax.fori_loop(0, iters, lloyd, centroids)
    labels = jnp.argmin(_pairwise_sqdist(x, centroids), axis=-1).astype(jnp.int32)
    return centroids, labels


def assign_labels(x: jnp.ndarray, centroids: jnp.ndarray, metric: str = "l2") -> jnp.ndarray:
    """Nearest-centroid labels (the reference's _measure_distance,
    proposal_generation_model.py:212-218: 'dot' -> argmax x.c, 'l2' -> argmin).

    Args:
      x: (..., D); centroids: (K, D).
    Returns:
      (...,) int32 labels.
    """
    if metric == "dot":
        scores = jnp.einsum("...d,kd->...k", x, centroids)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)
    if metric == "l2":
        flat = x.reshape(-1, x.shape[-1])
        d = _pairwise_sqdist(flat, centroids)
        return jnp.argmin(d, axis=-1).reshape(x.shape[:-1]).astype(jnp.int32)
    raise ValueError(f"unknown metric {metric!r}")
