"""PartDistillation-TPU: a TPU-native (JAX/XLA/Pallas) framework for unsupervised
part segmentation, re-designed from scratch with the capabilities of
facebookresearch/PartDistillation.

The reference system is a five-stage pseudo-label pipeline (object labeling ->
pixel grouping -> part-proposal learning -> part ranking -> self-training) built
on detectron2/Mask2Former with CUDA kernels and SLURM job farms. This framework
provides the same five stages as library-level programs over a single
`jax.sharding.Mesh`, with:

  * Flax models (Swin backbone, deformable pixel decoder, Mask2Former decoder)
  * XLA/Pallas compute kernels (multi-scale deformable attention, masked
    attention, batched masked k-means, dense-CRF mean field)
  * a sharded pseudo-label store replacing millions of per-image torch.save files
  * on-device set-criterion losses with an auction-based LSAP matcher
  * pjit/shard_map data parallelism replacing DDP + SLURM job farms.
"""

__version__ = "0.1.0"
