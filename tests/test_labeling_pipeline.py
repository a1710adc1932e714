"""run_labeling_batched pipelining parity: the double-buffered host loop
(dispatch batch i+1 before draining batch i; scorer.batched_async device
handles read back one batch late; bit-packed mask downloads) must produce
byte-identical records to the plain per-image serial path."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full suite only

from partdistillation_tpu.data.pseudo_store import PseudoLabelStore, ShardWriter
from partdistillation_tpu.models.meta_arch.labeling import (
    LabelingConfig,
    clip_region_scorer_jax,
    make_proposal_detection_fn,
    run_labeling_batched,
)
from partdistillation_tpu.models.meta_arch.proposal import ProposalModelConfig
from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
from partdistillation_tpu.models.segmenter import SegmenterConfig
from partdistillation_tpu.models.swin import SwinConfig
from partdistillation_tpu.models.transformer_decoder import (
    TransformerDecoderConfig)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from partdistillation_tpu.models.clip_vit import (CLIPVisionTower,
                                                      CLIPVisionTowerConfig)
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.segmenter import MaskFormerSegmenter

    tmp = tmp_path_factory.mktemp("labelpipe")
    rng = np.random.RandomState(0)
    items = []
    # 11 images / batch 4 -> 3 chunks incl. a ragged tail: exercises the
    # prefetch + double-buffer + padded-batch paths together
    for i in range(11):
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        img[16:48, 8 + 2 * i:40 + 2 * i] = [200, 50, 50]
        p = str(tmp / f"im{i:02d}.jpg")
        Image.fromarray(img).save(p, quality=95)
        items.append({"image_id": f"im{i:02d}", "file_name": p,
                      "class_id": i % 3, "class_code": "n0"})

    seg = SegmenterConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8), window_size=4,
                        drop_path_rate=0.0),
        pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32,
                                         transformer_layers=1,
                                         transformer_ffn_dim=64, n_heads=4,
                                         n_points=2),
        decoder=TransformerDecoderConfig(num_classes=1, hidden_dim=32,
                                         num_queries=8, num_heads=4,
                                         dim_feedforward=64, dec_layers=2,
                                         mask_dim=32),
    )
    cfg = ProposalModelConfig(segmenter=seg, test_topk=4)
    model = MaskFormerSegmenter(seg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, 64, 64, 3))))
    detection_fn = jax.jit(make_proposal_detection_fn(cfg))

    ccfg = CLIPVisionTowerConfig(image_size=32, patch_size=8, hidden_size=32,
                                 num_layers=1, num_heads=2,
                                 intermediate_size=64, projection_dim=16)
    tower = CLIPVisionTower(ccfg)
    cparams = jax.jit(tower.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    temb = rng.randn(5, 16).astype(np.float32)
    temb /= np.linalg.norm(temb, axis=-1, keepdims=True)
    scorer = clip_region_scorer_jax(tower.apply, temb, crop_size=32,
                                    capacity=4, vision_params=cparams,
                                    crop_backend="device")
    return {"tmp": tmp, "items": items, "fn": detection_fn,
            "params": params, "scorer": scorer}


def _records(store_dir):
    return {r["image_id"]: r for r in PseudoLabelStore(store_dir)}


def test_pipelined_loop_matches_serial_scorer(env):
    scorer = env["scorer"]
    assert hasattr(scorer, "batched_async")  # the pipelined fast path

    d1 = str(env["tmp"] / "out_async")
    with ShardWriter(d1, 0, 1) as w:
        stats1 = run_labeling_batched(env["fn"], env["params"], env["items"],
                                      w, LabelingConfig(topk=4),
                                      region_scorer=scorer, image_size=64,
                                      batch_size=4, num_workers=2)

    # strip the batched fast paths -> per-image scorer inside drain
    def per_image(image, masks):
        return scorer(image, masks)

    d2 = str(env["tmp"] / "out_serial")
    with ShardWriter(d2, 0, 1) as w:
        stats2 = run_labeling_batched(env["fn"], env["params"], env["items"],
                                      w, LabelingConfig(topk=4),
                                      region_scorer=per_image, image_size=64,
                                      batch_size=4, num_workers=0)

    assert stats1["saved"] == stats2["saved"] == 11
    r1, r2 = _records(d1), _records(d2)
    assert sorted(r1) == sorted(r2)
    for iid in r1:
        a, b = r1[iid], r2[iid]
        assert a["object_masks"] == b["object_masks"], iid
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-5)
        assert a["pred_classes"] == b["pred_classes"], iid


def test_pipelined_loop_resume_skips(env):
    d = str(env["tmp"] / "out_async")  # already written by the parity test
    with ShardWriter(d, 0, 1) as w:
        stats = run_labeling_batched(env["fn"], env["params"], env["items"],
                                     w, LabelingConfig(topk=4),
                                     region_scorer=env["scorer"],
                                     image_size=64, batch_size=4)
    assert stats["saved"] == 0 and stats["skipped"] == 11
