"""Device mesh + sharding utilities.

The reference scales with detectron2 DDP inside a job plus 40-60-way SLURM job
farms across dataset partitions (SURVEY.md §2.7). The TPU-native replacement is
one `jax.sharding.Mesh` over the whole slice/pod:

  * `data` axis: batch-sharded training/inference (subsumes both DDP and the
    job farms — each host feeds its local shard of the example stream)
  * optional `model` axis: for the stage-5 22k*8+1-way classifier, the one
    genuinely huge matmul in the system

Collectives ride ICI via XLA (psum in the criterion, all_gathers inserted by
pjit); host-level object gathers (evaluators) use multihost_utils.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "giant_head_rule",
    "tree_shardings",
]


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """1-D or 2-D mesh (data-major). Uses the first n_data*n_model devices;
    an explicit n_data smaller than available leaves the rest idle (useful
    when the per-host batch doesn't divide the device count)."""
    devices = np.asarray(jax.devices())
    total = len(devices)
    if n_data is None:
        n_data = total // n_model
    need = n_data * n_model
    assert need <= total, (n_data, n_model, total)
    return Mesh(devices[:need].reshape(n_data, n_model), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-global batch pytree with leading batch dim on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def giant_head_rule(path: str, leaf) -> P:
    """Sharding rule for the stage-5 giant part classifier: shard the
    (hidden, num_obj*num_parts+1) kernel's HIDDEN dim over the `model` axis
    (pad-free — the odd column count never divides evenly), replicate
    everything else. Path-keyed, so the Adam moments that mirror the param
    tree inside the optimizer state inherit the same spec automatically.

    Reference analog: the one genuinely huge matmul in the system, the
    Linear(hidden, 22000*8+1) head of
    part_distillation_transformer_decoder.py:107."""
    if "part_class_kernel" in path and getattr(leaf, "ndim", 0) >= 2:
        return P("model", None)
    return P()


def tree_shardings(mesh: Mesh, tree, rule=None):
    """NamedSharding pytree for ``tree`` under a (path_str, leaf) -> spec rule
    (replicated where rule is None). The single source of truth for how
    params AND optimizer state land on the mesh — used by both
    engine.trainer.Trainer and the driver's multichip dryrun."""
    def f(path, leaf):
        path_s = "/".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path)
        spec = rule(path_s, leaf) if rule is not None else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(f, tree)
