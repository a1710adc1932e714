"""AOT production-geometry multi-chip sharding checks (VERDICT r3 #9).

The driver dryrun proves the stage-5 Trainer step executes on tiny shapes;
these tests close the remaining gap by lowering the FULL-SIZE train steps
(Swin-L 640^2, 200 queries / 9 decoder layers; stage 5 with the real
22000*8+1-column part classifier) over the 8-device virtual CPU mesh — via
`jax.eval_shape` + AOT `.lower()`, so no giant buffer is ever materialized —
and asserting sharding facts on the lowered/compiled HLO:

  * the giant head kernel (and its Adam moments) carry the `model`-axis
    sharding into the program (P("model", None) on the (256, 176001) kernel);
  * after SPMD partitioning, parameters are per-shard sized — no full-size
    replicated head buffer exists anywhere in the compiled module.

Reference analog: stage-5's 8-node DDP fully replicates the float64 head
(part_distillation_transformer_decoder.py:107); the TPU-native design shards
it (SURVEY.md §2.7 TP row).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.slow  # full-size lowering is compile-heavy

from partdistillation_tpu.engine.optim import OptimizerConfig, build_optimizer
from partdistillation_tpu.engine.trainer import TrainState, build_train_step
from partdistillation_tpu.parallel.mesh import giant_head_rule, tree_shardings

B, H, W, T = 8, 640, 640, 8  # reference stage-5 batch/chip = 8 (train.sh:14)
NUM_OBJ, NUM_PARTS = 22000, 8
HEAD_COLS = NUM_OBJ * NUM_PARTS + 1  # 176001


def _mesh(n_data, n_model):
    devs = np.asarray(jax.devices()[: n_data * n_model])
    return Mesh(devs.reshape(n_data, n_model), ("data", "model"))


def _abstract_state(model, init_args, init_kwargs, ocfg):
    """TrainState of ShapeDtypeStructs via eval_shape — nothing materialized."""
    params = jax.eval_shape(
        lambda *a, **k: model.init(jax.random.PRNGKey(0), *a, **k),
        *init_args, **init_kwargs)
    tx = build_optimizer(ocfg, params)
    opt_state = jax.eval_shape(tx.init, params)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    state = TrainState(step=jax.ShapeDtypeStruct((), jnp.int32),
                       params=params, opt_state=opt_state, rng=key)
    return state, tx


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _stage5_lowered(n_data=4, n_model=2):
    from partdistillation_tpu.losses.criterion import CriterionConfig
    from partdistillation_tpu.losses.matcher import MatcherConfig
    from partdistillation_tpu.models.meta_arch.part_distillation import (
        PartDistillationConfig, make_loss_fn)
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import (MaskFormerSegmenter,
                                                       SegmenterConfig)
    from partdistillation_tpu.models.swin import swin_large_config
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig)

    mesh = _mesh(n_data, n_model)
    seg = SegmenterConfig(
        swin=swin_large_config(dtype=jnp.bfloat16),
        pixel_decoder=PixelDecoderConfig(dtype=jnp.bfloat16),
        decoder=TransformerDecoderConfig(
            num_classes=NUM_PARTS, num_queries=200, dec_layers=9,
            num_object_classes=NUM_OBJ, num_parts=NUM_PARTS,
            dtype=jnp.bfloat16),
        freeze_backbone=True, freeze_pixel_decoder=True,
    )
    cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=NUM_PARTS, num_points=12544,
                                  importance_sample_ratio=0.0,
                                  matcher=MatcherConfig(num_points=12544)),
        num_parts=NUM_PARTS,
    )
    model = MaskFormerSegmenter(seg)

    img = _sds((1, H, W, 3), jnp.float32)
    goc1 = _sds((1,), jnp.int32)
    state, tx = _abstract_state(
        model,
        (jax.eval_shape(normalize_images, img),),
        {"gt_object_class": goc1},
        OptimizerConfig(freeze_keys=("backbone", "pixel_decoder"),
                        warmup_iters=0),
    )
    shardings = tree_shardings(mesh, state, giant_head_rule)
    batch = {
        "image": _sds((B, H, W, 3), jnp.float32),
        "masks": _sds((B, T, H, W), jnp.float32),
        "labels": _sds((B, T), jnp.int32),
        "valid": _sds((B, T), jnp.bool_),
        "gt_object_class": _sds((B,), jnp.int32),
    }
    step = build_train_step(tx, make_loss_fn(cfg))
    jitted = jax.jit(step,
                     in_shardings=(shardings, NamedSharding(mesh, P("data"))),
                     out_shardings=(shardings, NamedSharding(mesh, P())))
    return jitted.lower(state, batch)


def test_stage5_full_size_head_sharding_lowered():
    lowered = _stage5_lowered()
    txt = lowered.as_text()
    # the full-size head kernel appears as a program argument sharded over
    # the model axis on its hidden dim (Shardy annotations in current JAX)
    head_args = re.findall(
        r'tensor<256x176001xf32> \{sdy\.sharding = '
        r'#sdy\.sharding<@mesh, \[\{"model"\}, \{\}\]>\}', txt)
    # kernel + both Adam moments carry the same model-axis sharding
    assert len(head_args) >= 3, (
        f"expected >=3 model-sharded (256,176001) args, found "
        f"{len(head_args)}; unsharded occurrences: "
        f"{len(re.findall(r'tensor<256x176001xf32>', txt))}")


def test_stage5_full_size_compiled_no_replicated_head():
    lowered = _stage5_lowered()
    compiled = lowered.compile()
    txt = compiled.as_text()
    # SPMD-partitioned module: the head exists only in per-shard form
    # (hidden 256 split over model=2 -> 128)
    assert "128,176001" in txt.replace(" ", ""), \
        "per-shard head kernel (f32[128,176001]) not found in compiled module"
    flat = txt.replace(" ", "")
    assert "256,176001" not in flat, \
        "full-size replicated head buffer found in compiled module"


def test_stage3_full_size_batch_sharding_lowered():
    from partdistillation_tpu.losses.criterion import CriterionConfig
    from partdistillation_tpu.losses.matcher import MatcherConfig
    from partdistillation_tpu.models.meta_arch.proposal import (
        ProposalModelConfig, make_loss_fn, normalize_images)
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import (MaskFormerSegmenter,
                                                       SegmenterConfig)
    from partdistillation_tpu.models.swin import swin_large_config
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig)

    mesh = _mesh(8, 1)
    seg = SegmenterConfig(
        swin=swin_large_config(dtype=jnp.bfloat16),
        pixel_decoder=PixelDecoderConfig(dtype=jnp.bfloat16),
        decoder=TransformerDecoderConfig(num_classes=1, num_queries=200,
                                         dec_layers=9, dtype=jnp.bfloat16),
        freeze_backbone=True, freeze_pixel_decoder=True,
    )
    cfg = ProposalModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=1, num_points=12544,
                                  importance_sample_ratio=0.0,
                                  matcher=MatcherConfig(num_points=12544)),
    )
    model = MaskFormerSegmenter(seg)
    img = _sds((1, H, W, 3), jnp.float32)
    state, tx = _abstract_state(
        model, (jax.eval_shape(normalize_images, img),), {},
        OptimizerConfig(freeze_keys=("backbone", "pixel_decoder"),
                        warmup_iters=0))
    shardings = tree_shardings(mesh, state, None)
    bs = 16 * 8  # reference global batch 512 over 64 GPUs -> 16/chip here
    batch = {
        "image": _sds((bs, H, W, 3), jnp.float32),
        "masks": _sds((bs, T, H, W), jnp.float32),
        "valid": _sds((bs, T), jnp.bool_),
    }
    step = build_train_step(tx, make_loss_fn(cfg))
    jitted = jax.jit(step,
                     in_shardings=(shardings, NamedSharding(mesh, P("data"))),
                     out_shardings=(shardings, NamedSharding(mesh, P())))
    txt = jitted.lower(state, batch).as_text()
    # the image batch arg is sharded over data (8-way on the leading dim)
    img_args = re.findall(
        r'tensor<128x640x640x3xf32> \{sdy\.sharding = '
        r'#sdy\.sharding<@mesh, \[\{"data"\}', txt)
    assert img_args, "data-sharded image batch arg not found"
