"""Stage-2/4/5 meta-model core tests on tiny configs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from partdistillation_tpu.losses.criterion import CriterionConfig
from partdistillation_tpu.losses.matcher import MatcherConfig
from partdistillation_tpu.models.meta_arch.part_distillation import (
    PartDistillationConfig,
    make_inference_fn as pd_infer,
    make_loss_fn as pd_loss,
)
from partdistillation_tpu.models.meta_arch.part_ranking import (
    PartRankingConfig,
    RankingMode,
    classifier_scores,
    make_cluster_fn,
    make_label_fn,
)
from partdistillation_tpu.models.meta_arch.proposal import normalize_images
from partdistillation_tpu.models.meta_arch.proposal_generation import (
    ProposalGenerationConfig,
    make_generation_fn,
)
from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
from partdistillation_tpu.models.segmenter import MaskFormerSegmenter, SegmenterConfig
from partdistillation_tpu.models.swin import SwinConfig, SwinTransformer
from partdistillation_tpu.models.transformer_decoder import TransformerDecoderConfig


def tiny_swin():
    return SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                      window_size=4, drop_path_rate=0.0)


def tiny_seg(num_classes=1, num_object_classes=0, num_parts=4, q=12):
    return SegmenterConfig(
        swin=tiny_swin(),
        pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32, transformer_layers=1,
                                         transformer_ffn_dim=64, n_heads=4, n_points=2),
        decoder=TransformerDecoderConfig(num_classes=num_classes, hidden_dim=32,
                                         num_queries=q, num_heads=4, dim_feedforward=64,
                                         dec_layers=2, mask_dim=32,
                                         num_object_classes=num_object_classes,
                                         num_parts=num_parts),
    )


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_proposal_generation_shapes_and_validity():
    cfg = ProposalGenerationConfig(swin=tiny_swin(), feature_keys=("res3", "res4"),
                                   num_clusters=4, kmeans_iters=10)
    model = SwinTransformer(cfg.swin)
    b, h, w = 2, 32, 32
    image = jnp.asarray(np.random.RandomState(0).randint(0, 255, (b, h, w, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), normalize_images(image))

    obj = np.zeros((b, h, w), bool)
    obj[0, 4:28, 4:28] = True  # image 0: big object
    # image 1: mask too small for k-means (< k feature pixels)
    obj[1, 0:2, 0:2] = True

    fn = jax.jit(make_generation_fn(cfg))
    out = fn(params, {"image": image, "object_mask": jnp.asarray(obj)}, jax.random.PRNGKey(1))
    assert out["part_masks"].shape == (b, 4, h, w)
    pm = np.asarray(out["part_masks"])
    pv = np.asarray(out["part_valid"])
    # proposals stay inside the object mask
    assert not (pm[0] & ~obj[0][None]).any()
    # image 0 has at least 2 non-empty parts; image 1 invalid (too few pixels)
    assert pv[0].sum() >= 2
    assert pv[1].sum() == 0
    np.testing.assert_allclose(np.asarray(out["object_ratio"])[0], obj[0].mean(), atol=1e-5)
    # parts partition the object (per-pixel unique)
    union = pm[0][pv[0]].sum(0)
    assert (union <= 1).all()
    assert (union.astype(bool) == obj[0]).all()


def test_classifier_scores_l2_vs_dot():
    feats = np.random.RandomState(0).randn(5, 8).astype(np.float32)
    cents = np.random.RandomState(1).randn(3, 8).astype(np.float32)
    l2 = np.asarray(classifier_scores(jnp.asarray(feats), jnp.asarray(cents), "l2"))
    # argmax of 2ab - a² - b² == argmin of squared distance
    d2 = ((feats[:, None] - cents[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(l2.argmax(1), d2.argmin(1))
    dot = np.asarray(classifier_scores(jnp.asarray(feats), jnp.asarray(cents), "dot"))
    np.testing.assert_allclose(dot, feats @ cents.T, rtol=1e-4)


def _ranking_setup():
    seg = tiny_seg(q=12)
    cfg = PartRankingConfig(segmenter=seg, num_clusters=3, test_topk=12)
    model = MaskFormerSegmenter(seg)
    b, h, w, t = 2, 32, 32, 3
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randint(0, 255, (b, h, w, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), normalize_images(image))
    masks = np.zeros((b, t, h, w), bool)
    for bi in range(b):
        for ti in range(t):
            masks[bi, ti, :, ti * 10 : (ti + 1) * 10] = True
    batch = {
        "image": image,
        "masks": jnp.asarray(masks),
        "mask_labels": jnp.tile(jnp.arange(t)[None], (b, 1)).astype(jnp.int32),
        "mask_valid": jnp.ones((b, t), bool),
        "object_mask": jnp.asarray(masks.any(1)),
        "object_label": jnp.asarray([0, 1], jnp.int32),
    }
    return cfg, params, batch


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_part_ranking_cluster_and_label():
    cfg, params, batch = _ranking_setup()
    cluster = jax.jit(make_cluster_fn(cfg))
    out = cluster(params, batch)
    assert out["feats"].shape == (2, 12, 32)
    # features are l2-normalized
    norms = np.linalg.norm(np.asarray(out["feats"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    centroids = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32), jnp.float32)
    label = jax.jit(make_label_fn(cfg, RankingMode.SAVE))
    out2 = label(params, batch, centroids)
    assert out2["pred_masks"].shape == (2, 3, 32, 32)
    assert out2["pred_labels"].shape == (2, 3)

    mapping = jnp.asarray([[2, 1, 0], [0, 0, 1]], jnp.int32)
    ev = jax.jit(make_label_fn(cfg, RankingMode.EVAL))
    out3 = ev(params, batch, centroids, mapping)
    assert out3["pred_masks"].shape == (2, 3, 32, 32)


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_part_distillation_loss_and_inference():
    seg = tiny_seg(num_classes=4, num_object_classes=6, num_parts=4, q=12)
    cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=4, num_points=64, deep_supervision=False,
                                  matcher=MatcherConfig(num_points=64)),
        num_parts=4, test_topk=12,
    )
    model = MaskFormerSegmenter(seg)
    b, h, w, t = 2, 32, 32, 3
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (b, h, w, 3)), jnp.float32),
        "masks": jnp.asarray(rng.rand(b, t, h, w) < 0.3),
        "labels": jnp.asarray(rng.randint(0, 4, (b, t)), jnp.int32),
        "valid": jnp.ones((b, t), bool),
        "gt_object_class": jnp.asarray([1, 5], jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), normalize_images(batch["image"]),
                        gt_object_class=batch["gt_object_class"])

    loss_fn = jax.jit(pd_loss(cfg))
    total, losses = loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))

    eval_batch = dict(batch)
    eval_batch.update({
        "part_masks": batch["masks"],
        "part_labels": batch["labels"],
        "part_valid": batch["valid"],
        "object_masks": jnp.any(batch["masks"], 1, keepdims=True),
        "object_valid": jnp.ones((b, 1), bool),
    })
    mapping = jnp.zeros((6, 4), jnp.int32)
    infer = jax.jit(lambda p, bb: pd_infer(cfg, mode="eval")(p, bb, mapping))
    out = infer(params, eval_batch)
    assert out["pred_masks"].shape == (b, 4, h, w)  # merged to num_parts slots
    assert out["pred_labels"].shape == (b, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()
