"""n_model_shards is REAL in the production Trainer: under a (data x model)
mesh with giant_head_rule, the stage-5 part classifier kernel AND its Adam
moments carry P("model", None) sharding, and one train step produces the same
loss as the fully-replicated run (VERDICT r2 missing #2; reference analog:
part_distillation_transformer_decoder.py:107)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

pytestmark = pytest.mark.slow  # two stage-5 step compiles (~5 min on this box)

from partdistillation_tpu.engine.optim import OptimizerConfig
from partdistillation_tpu.engine.trainer import Trainer
from partdistillation_tpu.losses.criterion import CriterionConfig
from partdistillation_tpu.losses.matcher import MatcherConfig
from partdistillation_tpu.models.meta_arch.part_distillation import (
    PartDistillationConfig, make_loss_fn)
from partdistillation_tpu.models.meta_arch.proposal import normalize_images
from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
from partdistillation_tpu.models.segmenter import (MaskFormerSegmenter,
                                                   SegmenterConfig)
from partdistillation_tpu.models.swin import SwinConfig
from partdistillation_tpu.models.transformer_decoder import (
    TransformerDecoderConfig)
from partdistillation_tpu.parallel.mesh import (giant_head_rule, shard_batch,
                                                tree_shardings)


def _tiny_cfg(num_obj=16, num_parts=4):
    seg = SegmenterConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                        window_size=4, drop_path_rate=0.0),
        pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32,
                                         transformer_layers=1,
                                         transformer_ffn_dim=64, n_heads=4,
                                         n_points=2),
        decoder=TransformerDecoderConfig(
            num_classes=num_parts, hidden_dim=32, num_queries=8, num_heads=4,
            dim_feedforward=64, dec_layers=1, mask_dim=32,
            num_object_classes=num_obj, num_parts=num_parts),
    )
    return PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=num_parts, num_points=32,
                                  deep_supervision=False,
                                  matcher=MatcherConfig(num_points=32)),
        num_parts=num_parts, test_topk=8)


def _batch(b=8, t=2, h=32, w=32, num_obj=16, num_parts=4):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)),
        "masks": jnp.asarray(rng.rand(b, t, h, w) < 0.3),
        "labels": jnp.asarray(rng.randint(0, num_parts, (b, t)).astype(np.int32)),
        "valid": jnp.ones((b, t), bool),
        "gt_object_class": jnp.asarray(rng.randint(0, num_obj, (b,)).astype(np.int32)),
    }


def _flat_paths(tree):
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(k, "key", getattr(k, "name",
                       getattr(k, "idx", k)))) for k in path)
        out[key] = leaf
    return out


def _make_trainer(mesh, rules):
    cfg = _tiny_cfg()
    model = MaskFormerSegmenter(cfg.segmenter)
    batch = _batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 normalize_images(batch["image"][:1]),
                                 gt_object_class=batch["gt_object_class"][:1])
    return Trainer(loss_fn=make_loss_fn(cfg), init_params=params,
                   optimizer_cfg=OptimizerConfig(warmup_iters=0),
                   mesh=mesh, seed=0, sharding_rules=rules), batch


@pytest.mark.parametrize("head_slice", ["gather", "onehot"])
def test_giant_head_sharded_in_production_trainer(head_slice, monkeypatch):
    # both head formulations must compose with the model-sharded kernel:
    # gather = local take over the un-sharded column axis; onehot = 0/1
    # einsum contracting the sharded hidden axis under GSPMD (the
    # donation-safe production default for the UNSHARDED head)
    monkeypatch.setenv("PD_HEAD_SLICE", head_slice)
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    trainer, batch = _make_trainer(mesh, giant_head_rule)

    # params: kernel sharded over model, everything else replicated
    sh = _flat_paths(trainer._state_shardings)
    kernel_specs = {p: s.spec for p, s in sh.items() if "part_class_kernel" in p}
    assert kernel_specs, "no part_class_kernel leaves found"
    # params + adam mu + adam nu = at least 3 path-keyed hits
    assert len(kernel_specs) >= 3, sorted(kernel_specs)
    for p, spec in kernel_specs.items():
        assert spec == P("model", None), (p, spec)
    bias_specs = [s.spec for p, s in sh.items() if "part_class_bias" in p]
    assert bias_specs and all(s == P() for s in bias_specs)

    # live arrays actually carry the sharding (not just the plan)
    arrs = _flat_paths(trainer.state)
    for p, a in arrs.items():
        if "part_class_kernel" in p and hasattr(a, "sharding"):
            assert a.sharding.spec == P("model", None), p

    metrics = trainer.train_step(shard_batch(mesh, batch))
    loss_sharded = float(metrics["total_loss"])
    assert np.isfinite(loss_sharded)

    # post-update params keep the sharding (out_shardings round-trip)
    arrs = _flat_paths(trainer.state.params)
    kern = [a for p, a in arrs.items() if "part_class_kernel" in p]
    assert kern and kern[0].sharding.spec == P("model", None)

    # replicated (pure data-parallel) run on the same 8 devices: identical
    # batch, identical init/seed -> same loss up to collective reordering
    mesh_dp = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                   ("data", "model"))
    trainer_dp, batch_dp = _make_trainer(mesh_dp, None)
    loss_repl = float(trainer_dp.train_step(shard_batch(mesh_dp, batch_dp))["total_loss"])
    np.testing.assert_allclose(loss_sharded, loss_repl, rtol=2e-4)


def test_tree_shardings_default_replicates():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    tree = {"a": jnp.zeros((4, 4)), "b": {"c": jnp.zeros(3)}}
    sh = tree_shardings(mesh, tree)
    flat = _flat_paths(sh)
    assert all(s.spec == P() for s in flat.values())
