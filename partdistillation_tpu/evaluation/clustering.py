"""Stage-4 cross-image feature clustering (the reference ClusteringModule,
evaluation/clustering_module.py:18-81).

The reference all_gathers every proposal's decoder feature to rank 0 and runs
sklearn KMeans(k=8) per object class on CPU. Here features accumulate into a
fixed-capacity per-class buffer and the per-class k-means runs batched ON
DEVICE (vmapped masked k-means over the class axis); multi-host runs gather
host arrays with process_allgather first.

Classes with <= k features get random-normal centroids, matching
clustering_module.py:63-64.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import masked_kmeans

__all__ = ["ClusteringModule"]


class ClusteringModule:
    def __init__(self, num_object_classes: int, feat_dim: int, num_clusters: int = 8,
                 capacity_per_class: int = 4096, distributed: bool = False, seed: int = 0):
        self.num_object_classes = num_object_classes
        self.feat_dim = feat_dim
        self.k = num_clusters
        self.cap = capacity_per_class
        self.distributed = distributed
        self.seed = seed
        self.reset()

    def reset(self):
        self._feats = np.zeros((self.num_object_classes, self.cap, self.feat_dim), np.float32)
        self._counts = np.zeros((self.num_object_classes,), np.int64)

    def process(self, outputs: Dict, object_class):
        """outputs: {feats (B,K,D), valid (B,K)}; object_class (B,)."""
        feats = np.asarray(outputs["feats"])
        valid = np.asarray(outputs["valid"])
        oc = np.asarray(object_class)
        for b in range(feats.shape[0]):
            c = int(oc[b])
            f = feats[b][valid[b]]
            n = len(f)
            if n == 0:
                continue
            start = self._counts[c]
            end = min(start + n, self.cap)  # reservoir-free cap: keep first N
            take = end - start
            if take > 0:
                self._feats[c, start:end] = f[:take]
            self._counts[c] = min(start + n, self.cap)

    def evaluate(self) -> np.ndarray:
        """Returns the classifier bank: (num_object_classes, k, D) centroids."""
        feats, counts = self._feats, self._counts
        if self.distributed:  # pragma: no cover - multihost only
            from jax.experimental import multihost_utils

            all_f = multihost_utils.process_allgather(feats)
            all_c = multihost_utils.process_allgather(counts)
            merged_f = np.zeros_like(feats)
            merged_c = np.zeros_like(counts)
            for f, c in zip(all_f, all_c):
                for cls in range(self.num_object_classes):
                    start = merged_c[cls]
                    take = min(int(c[cls]), self.cap - start)
                    if take > 0:
                        merged_f[cls, start : start + take] = f[cls, :take]
                        merged_c[cls] += take
            feats, counts = merged_f, merged_c

        mask = np.arange(self.cap)[None, :] < counts[:, None]  # (C, cap)
        keys = jax.random.split(jax.random.PRNGKey(self.seed), self.num_object_classes)

        cents, _ = jax.jit(
            jax.vmap(lambda x, m, k: masked_kmeans(x, m, self.k, k))
        )(jnp.asarray(feats), jnp.asarray(mask), keys)
        cents = np.array(cents)  # writable copy

        # classes with too few samples: random centroids (reference behavior)
        rng = np.random.RandomState(self.seed)
        few = counts <= self.k
        if few.any():
            cents[few] = rng.randn(int(few.sum()), self.k, self.feat_dim).astype(np.float32)
        return cents
