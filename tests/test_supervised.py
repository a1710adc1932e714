"""Supervised/fewshot ablation: loss fn, inference fn, CLI train + eval."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate (-m 'not slow')

from partdistillation_tpu import run as cli
from partdistillation_tpu.losses.criterion import CriterionConfig
from partdistillation_tpu.losses.matcher import MatcherConfig
from partdistillation_tpu.models.meta_arch.supervised import (
    SupervisedModelConfig,
    make_inference_fn,
    make_loss_fn,
)
from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
from partdistillation_tpu.models.segmenter import MaskFormerSegmenter, SegmenterConfig
from partdistillation_tpu.models.swin import SwinConfig
from partdistillation_tpu.models.transformer_decoder import TransformerDecoderConfig


def _tiny_cfg(num_classes, n_parts=5):
    seg = SegmenterConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                        window_size=4, drop_path_rate=0.0),
        pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32,
                                         transformer_layers=1,
                                         transformer_ffn_dim=64, n_heads=4,
                                         n_points=2),
        decoder=TransformerDecoderConfig(num_classes=num_classes, hidden_dim=32,
                                         num_queries=8, num_heads=4,
                                         dim_feedforward=64, dec_layers=2,
                                         mask_dim=32),
    )
    return SupervisedModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=num_classes, num_points=64,
                                  matcher=MatcherConfig(num_points=64)),
        num_part_classes=n_parts,
        class_agnostic_learning=num_classes == 1,
        class_agnostic_inference=num_classes == 1,
        test_topk=8)


def _batch(rng, b=2, t=3, s=32, n_parts=5):
    return {
        "image": jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32) * 255),
        "masks": jnp.asarray(rng.rand(b, t, s, s) < 0.3),
        "labels": jnp.asarray(rng.randint(0, n_parts, (b, t)).astype(np.int32)),
        "valid": jnp.ones((b, t), bool),
        "object_mask": jnp.asarray(rng.rand(b, s, s) < 0.8),
    }


@pytest.mark.parametrize("num_classes", [1, 5])
def test_supervised_loss_and_grad(num_classes):
    cfg = _tiny_cfg(num_classes)
    model = MaskFormerSegmenter(cfg.segmenter)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"][:1])
    loss_fn = make_loss_fn(cfg)
    (loss, metrics), grads = jax.jit(
        lambda p, b, k: jax.value_and_grad(loss_fn, has_aux=True)(p, b, k)
    )(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x * x), grads, 0.0))
    assert gnorm > 0.0


@pytest.mark.parametrize("num_classes", [1, 5])
def test_supervised_inference_shapes(num_classes):
    cfg = _tiny_cfg(num_classes)
    model = MaskFormerSegmenter(cfg.segmenter)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"][:1])
    out = jax.jit(make_inference_fn(cfg))(params, batch)
    b = batch["image"].shape[0]
    if cfg.use_unique_per_pixel_label:
        assert out["pred_masks"].shape == (b, 5, 32, 32)  # merged to n_parts
        np.testing.assert_array_equal(np.asarray(out["pred_labels"]),
                                      np.tile(np.arange(5), (b, 1)))
    assert out["valid"].dtype == bool


def test_supervised_cli_train_eval(tmp_path, capsys):
    import os

    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        fname = f"n02084071_{i}.JPEG"
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(
            str(img_dir / fname))
        images.append({"id": i, "file_name": fname, "height": 48, "width": 48})
        annotations.append({
            "id": i * 2, "image_id": i, "category_id": i % 3,
            "segmentation": [[4.0, 4.0, 40.0, 4.0, 40.0, 40.0, 4.0, 40.0]]})
    jf = tmp_path / "parts.json"
    jf.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": f"part{c}"} for c in range(3)]}))

    ov = [f"data.part_imagenet_json={jf}", f"data.part_imagenet_images={img_dir}",
          "data.image_size=48", "data.batch_size=4", "data.num_workers=2",
          f"checkpoint_dir={tmp_path}/ckpt", "max_iters=2", "log_every=1",
          "checkpoint_every=1000"]
    cli.main(["train-supervised", "--tiny", "--num-queries", "8",
              "--num-part-classes", "3", "--set", *ov])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] >= 2

    # eval the just-trained weights (the guard rejects weightless eval)
    cli.main(["eval-supervised", "--tiny", "--num-queries", "8",
              "--num-part-classes", "3",
              "--trainer-checkpoint", f"{tmp_path}/ckpt/supervised",
              "--set", *ov])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "C-mIoU" in res and np.isfinite(res["C-mIoU"])

    # fewshot subsetting goes through the same entry (fresh checkpoint dir:
    # the class-agnostic head has a different shape than the 3-class one)
    ov2 = [o if not o.startswith("checkpoint_dir=") else
           f"checkpoint_dir={tmp_path}/ckpt_agn" for o in ov]
    cli.main(["train-supervised", "--tiny", "--num-queries", "8",
              "--num-part-classes", "3", "--label-percentage", "50",
              "--class-agnostic", "--set", *ov2])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] >= 2


def test_supervised_cli_alternative_heads(tmp_path, capsys):
    """--pixel-decoder/--decoder select the v1 heads (PIXEL_DECODER_NAME /
    TRANSFORMER_DECODER_NAME registry-dispatch parity)."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        fname = f"n02084071_{i}.JPEG"
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(
            str(img_dir / fname))
        images.append({"id": i, "file_name": fname, "height": 48, "width": 48})
        annotations.append({
            "id": i * 2, "image_id": i, "category_id": i % 3,
            "segmentation": [[4.0, 4.0, 40.0, 4.0, 40.0, 40.0, 4.0, 40.0]]})
    jf = tmp_path / "parts.json"
    jf.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": f"part{c}"} for c in range(3)]}))
    ov = [f"data.part_imagenet_json={jf}", f"data.part_imagenet_images={img_dir}",
          "data.image_size=48", "data.batch_size=4", "data.num_workers=2",
          f"checkpoint_dir={tmp_path}/ckpt_v1", "max_iters=2", "log_every=1",
          "checkpoint_every=1000"]
    cli.main(["train-supervised", "--tiny", "--num-queries", "8",
              "--num-part-classes", "3",
              "--pixel-decoder", "transformer_fpn", "--decoder", "standard",
              "--set", *ov])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] >= 2
