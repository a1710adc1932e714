"""End-to-end train smoke: tiny ProposalModel, loss decreases; optimizer
param-group semantics; inference fixed-capacity output; mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate (-m 'not slow')

from partdistillation_tpu.engine.optim import OptimizerConfig, build_optimizer, build_schedule
from partdistillation_tpu.engine.trainer import Trainer
from partdistillation_tpu.losses.criterion import CriterionConfig
from partdistillation_tpu.losses.matcher import MatcherConfig
from partdistillation_tpu.models.meta_arch.proposal import (
    ProposalModelConfig,
    make_inference_fn,
    make_loss_fn,
    normalize_images,
)
from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
from partdistillation_tpu.models.segmenter import MaskFormerSegmenter, SegmenterConfig
from partdistillation_tpu.models.swin import SwinConfig
from partdistillation_tpu.models.transformer_decoder import TransformerDecoderConfig


def tiny_cfg(num_queries=8):
    seg = SegmenterConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                        window_size=4, drop_path_rate=0.0),
        pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32, transformer_layers=1,
                                         transformer_ffn_dim=64, n_heads=4, n_points=2),
        decoder=TransformerDecoderConfig(num_classes=1, hidden_dim=32, num_queries=num_queries,
                                         num_heads=4, dim_feedforward=64, dec_layers=2,
                                         mask_dim=32),
    )
    return ProposalModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=1, num_points=256, deep_supervision=True,
                                  matcher=MatcherConfig(num_points=256)),
        test_topk=num_queries,
        min_ratio=0.0,
        min_score=-1.0,
    )


def synthetic_batch(b=2, t=3, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)
    masks = np.zeros((b, t, h, w), bool)
    for bi in range(b):
        for ti in range(t):
            masks[bi, ti, :, ti * (w // t) : (ti + 1) * (w // t)] = True
    valid = np.ones((b, t), bool)
    return {
        "image": jnp.asarray(image),
        "masks": jnp.asarray(masks),
        "valid": jnp.asarray(valid),
    }


def init_params(cfg, batch):
    model = MaskFormerSegmenter(cfg.segmenter)
    return model.init(jax.random.PRNGKey(0), normalize_images(batch["image"]))


def test_train_loss_decreases():
    cfg = tiny_cfg()
    batch = synthetic_batch()
    params = init_params(cfg, batch)
    trainer = Trainer(
        loss_fn=make_loss_fn(cfg),
        init_params=params,
        optimizer_cfg=OptimizerConfig(base_lr=5e-4, clip_norm=0.0, warmup_iters=0,
                                      schedule="multistep", steps=()),
    )
    losses = []
    for _ in range(12):
        m = trainer.train_step(batch)
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    assert trainer.step == 12


def test_trainer_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    batch = synthetic_batch()
    params = init_params(cfg, batch)
    t1 = Trainer(loss_fn=make_loss_fn(cfg), init_params=params,
                 optimizer_cfg=OptimizerConfig(), checkpoint_dir=str(tmp_path / "ck"))
    assert not t1.resume_or_load()
    t1.train_step(batch)
    t1.train_step(batch)
    t1.save()

    t2 = Trainer(loss_fn=make_loss_fn(cfg), init_params=params,
                 optimizer_cfg=OptimizerConfig(), checkpoint_dir=str(tmp_path / "ck"))
    assert t2.resume_or_load()
    assert t2.step == 2
    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_optimizer_freeze_and_multiplier():
    cfg = tiny_cfg()
    batch = synthetic_batch()
    params = init_params(cfg, batch)
    ocfg = OptimizerConfig(freeze_keys=("backbone",), warmup_iters=0, clip_norm=0.0)
    tx = build_optimizer(ocfg, params)
    opt_state = tx.init(params)

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)

    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    backbone = [np.abs(np.asarray(v)).sum() for p, v in flat if "backbone" in str(p)]
    head = [np.abs(np.asarray(v)).sum() for p, v in flat if "backbone" not in str(p)]
    assert sum(backbone) == 0.0  # frozen
    assert sum(head) > 0.0


def test_schedules():
    cfg = OptimizerConfig(base_lr=1.0, schedule="multistep", steps=(10, 20), gamma=0.1,
                          warmup_iters=0)
    s = build_schedule(cfg)
    assert float(s(0)) == 1.0
    np.testing.assert_allclose(float(s(15)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(25)), 0.01, rtol=1e-6)

    cfg = OptimizerConfig(base_lr=1.0, schedule="poly", max_iter=100, poly_power=0.9,
                          warmup_iters=0)
    s = build_schedule(cfg)
    np.testing.assert_allclose(float(s(50)), 0.5**0.9, rtol=1e-5)


def test_inference_fixed_capacity():
    cfg = tiny_cfg()
    batch = synthetic_batch()
    params = init_params(cfg, batch)
    infer = jax.jit(make_inference_fn(cfg))
    b, t, h, w = batch["masks"].shape
    eval_batch = {
        "image": batch["image"],
        "part_masks": batch["masks"],
        "part_labels": jnp.tile(jnp.arange(t)[None], (b, 1)).astype(jnp.int32),
        "part_valid": batch["valid"],
        "object_masks": jnp.any(batch["masks"], axis=1, keepdims=True),
        "object_valid": jnp.ones((b, 1), bool),
    }
    out = infer(params, eval_batch)
    k = cfg.test_topk
    assert out["pred_masks"].shape == (b, k, h, w)
    assert out["scores"].shape == (b, k)
    assert out["valid"].shape == (b, k)
    assert out["pred_masks"].dtype == jnp.bool_


def test_train_step_on_mesh():
    from partdistillation_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = tiny_cfg()
    batch = synthetic_batch(b=8)
    params = init_params(cfg, batch)
    mesh = make_mesh(n_data=8)
    trainer = Trainer(loss_fn=make_loss_fn(cfg), init_params=params,
                      optimizer_cfg=OptimizerConfig(), mesh=mesh)
    m = trainer.train_step(shard_batch(mesh, batch))
    assert np.isfinite(float(m["total_loss"]))


def test_graft_params_lenient_and_mapping_safe():
    """run._graft_params: shape-matched leaves graft, mismatches keep init,
    and Mapping containers (FrozenDict-style) normalize instead of becoming
    one unmatched leaf (ADVICE r4)."""
    from partdistillation_tpu.run import _graft_params

    init = {"trunk": {"w": np.zeros((3, 3)), "b": np.zeros((3,))},
            "head": {"w": np.zeros((3, 9))}}
    restored = {"trunk": {"w": np.ones((3, 3)), "b": np.ones((4,))}}
    out, stats = _graft_params(init, restored)
    assert stats == {"grafted": 1, "kept_init": 1}
    assert out["trunk"]["w"].sum() == 9 and out["trunk"]["b"].sum() == 0
    assert out["head"]["w"].sum() == 0  # absent subtree keeps init

    class FrozenLike:
        def __init__(self, d):
            self._d = d

        def items(self):
            return self._d.items()

        def keys(self):
            return self._d.keys()

    out2, stats2 = _graft_params(init, FrozenLike(
        {"trunk": FrozenLike({"w": np.full((3, 3), 2.0)})}))
    assert stats2["grafted"] == 1
    assert out2["trunk"]["w"].sum() == 18

    _, stats3 = _graft_params(init, {"other": {"x": np.zeros((1,))}})
    assert stats3["grafted"] == 0  # run.py refuses this with SystemExit
