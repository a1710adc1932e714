"""Stage-4 cross-image feature clustering (the reference ClusteringModule,
evaluation/clustering_module.py:18-81).

The reference all_gathers every proposal's decoder feature to rank 0 and runs
sklearn KMeans(k=8) per object class on CPU. Here features accumulate into
per-class RESERVOIR buffers (algorithm R — a uniform sample of the whole
stream, not the first-N early-image-biased prefix) and the per-class k-means
runs batched ON DEVICE (vmapped masked k-means, chunked over the class axis so
a 22k-class vocabulary never materializes one giant feature tensor).

Storage is sparse (dict keyed by object class): with per-host class
partitioning each host only pays for the classes it actually sees. Multi-host
runs merge host reservoirs with a pure, directly-tested function
(``merge_reservoirs``) over a pickled-object gather.

Classes with <= k features get random-normal centroids, matching
clustering_module.py:63-64.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.kmeans import masked_kmeans

__all__ = ["ClusteringModule", "merge_reservoirs"]

ReservoirState = Tuple[Dict[int, np.ndarray], Dict[int, int]]


def merge_reservoirs(states: List[ReservoirState], cap: int,
                     seed: int = 0) -> ReservoirState:
    """Merge per-host reservoirs into one.

    Each host buffer holds min(seen_h, cap) rows that are a uniform sample of
    that host's stream. The merged buffer draws from each host proportionally
    to its ``seen`` count (capped by what the host stored), so the result
    approximates a uniform sample of the concatenated stream.
    """
    rng = np.random.RandomState(seed)
    all_classes = sorted({c for feats, _ in states for c in feats})
    out_feats: Dict[int, np.ndarray] = {}
    out_seen: Dict[int, int] = {}
    for c in all_classes:
        stored = [(f[c][: min(s[c], cap)], s[c]) for f, s in states if c in f]
        total_seen = sum(s for _, s in stored)
        total_stored = sum(len(b) for b, _ in stored)
        if total_stored <= cap:
            merged = np.concatenate([b for b, _ in stored], axis=0)
        else:
            # proportional draw per host, remainders to the biggest streams
            quota = [min(len(b), int(cap * s / total_seen)) for b, s in stored]
            while sum(quota) < cap:
                room = [i for i, (b, _) in enumerate(stored) if quota[i] < len(b)]
                if not room:
                    break
                i = max(room, key=lambda i: stored[i][1])
                quota[i] += 1
            parts = []
            for (b, _), q in zip(stored, quota):
                idx = rng.permutation(len(b))[:q]
                parts.append(b[np.sort(idx)])
            merged = np.concatenate(parts, axis=0)[:cap]
        buf = np.zeros((cap, merged.shape[1]), np.float32)
        buf[: len(merged)] = merged
        out_feats[c] = buf
        out_seen[c] = total_seen
    return out_feats, out_seen


class ClusteringModule:
    def __init__(self, num_object_classes: int, feat_dim: int, num_clusters: int = 8,
                 capacity_per_class: int = 4096, distributed: bool = False, seed: int = 0,
                 kmeans_chunk: int = 64):
        self.num_object_classes = num_object_classes
        self.feat_dim = feat_dim
        self.k = num_clusters
        self.cap = capacity_per_class
        self.distributed = distributed
        self.seed = seed
        self.kmeans_chunk = kmeans_chunk
        self.reset()

    def reset(self):
        self._feats: Dict[int, np.ndarray] = {}
        self._seen: Dict[int, int] = {}
        self._rng = np.random.RandomState(self.seed + 12345)

    def process(self, outputs: Dict, object_class):
        """outputs: {feats (B,K,D), valid (B,K)}; object_class (B,)."""
        feats = np.asarray(outputs["feats"])
        valid = np.asarray(outputs["valid"])
        oc = np.asarray(object_class)
        for b in range(feats.shape[0]):
            c = int(oc[b])
            f = feats[b][valid[b]]
            if len(f) == 0:
                continue
            buf = self._feats.get(c)
            if buf is None:
                buf = self._feats[c] = np.zeros((self.cap, self.feat_dim), np.float32)
            seen = self._seen.get(c, 0)
            for row in f:  # reservoir sampling (algorithm R)
                if seen < self.cap:
                    buf[seen] = row
                else:
                    j = self._rng.randint(seen + 1)
                    if j < self.cap:
                        buf[j] = row
                seen += 1
            self._seen[c] = seen

    def evaluate(self) -> np.ndarray:
        """Returns the classifier bank: (num_object_classes, k, D) centroids."""
        import jax
        import jax.numpy as jnp

        feats_d, seen_d = self._feats, self._seen
        if self.distributed:  # pragma: no cover - multihost only
            from ..engine.launch import all_gather_objects

            states = all_gather_objects((feats_d, seen_d))
            feats_d, seen_d = merge_reservoirs(states, self.cap, self.seed)

        counts = np.zeros((self.num_object_classes,), np.int64)
        for c, s in seen_d.items():
            if 0 <= c < self.num_object_classes:
                counts[c] = min(s, self.cap)

        cents = np.zeros((self.num_object_classes, self.k, self.feat_dim), np.float32)
        kmeans = jax.jit(
            jax.vmap(lambda x, m, key: masked_kmeans(x, m, self.k, key)[0]))
        keys = jax.random.split(jax.random.PRNGKey(self.seed),
                                self.num_object_classes)

        # chunk over classes: only classes with features pay device memory
        todo = [c for c in range(self.num_object_classes) if counts[c] > self.k]
        chunk = max(self.kmeans_chunk, 1)
        for start in range(0, len(todo), chunk):
            idx = todo[start : start + chunk]
            pad = np.asarray(idx + [idx[-1]] * (chunk - len(idx)))  # static shape
            x = np.stack([feats_d[c] for c in pad])
            m = np.arange(self.cap)[None, :] < counts[pad, None]
            out = np.asarray(kmeans(jnp.asarray(x), jnp.asarray(m),
                                    keys[jnp.asarray(pad)]))
            cents[idx] = out[: len(idx)]

        # classes with too few samples: random centroids (reference behavior)
        rng = np.random.RandomState(self.seed)
        few = counts <= self.k
        if few.any():
            cents[few] = rng.randn(int(few.sum()), self.k, self.feat_dim).astype(np.float32)
        return cents
