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

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]


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
