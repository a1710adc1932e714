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


def test_class_match_selection_quality_with_engineered_tower():
    """VERDICT r4 #6: selection QUALITY, not just plumbing. A deterministic
    color-probe tower (mean-pooled RGB projection — CLIP-shaped contract:
    fn(params, pixels)->(N,D)) makes region embeddings separably encode the
    synthetic colors; with text rows built from pure-color probes through
    the SAME pipeline, the scorer must classify the red/green regions
    correctly, and _save_detection (the production class-match core,
    labeling_detic.py:64-77 semantics) must pick the class-MATCHED
    detection over a higher-scoring wrong-class one — and fall back to
    keep-all ranking when the synset has no match."""
    import jax
    import jax.numpy as jnp

    from partdistillation_tpu.models.meta_arch.labeling import (
        _save_detection, select_class_matched_topk)
    from partdistillation_tpu.utils import rle as rle_codec

    d = 8
    rng = np.random.RandomState(3)
    proj = rng.randn(3, d).astype(np.float32)

    def vision_apply(params, pixels):
        # (N, S, S, 3) CLIP-normalized -> mean color -> (N, D)
        return jnp.mean(pixels, axis=(1, 2)) @ params

    # text rows = pure-color probes through the same tower + normalization
    from partdistillation_tpu.models.clip_vit import normalize_clip_pixels

    probes = np.zeros((2, 8, 8, 3), np.float32)
    probes[0, :, :, 0] = 200 / 255.0  # "red thing"
    probes[1, :, :, 1] = 200 / 255.0  # "green thing"
    temb = np.asarray(vision_apply(proj, normalize_clip_pixels(
        jnp.asarray(probes))))
    temb /= np.linalg.norm(temb, axis=-1, keepdims=True)

    from partdistillation_tpu.models.meta_arch.labeling import (
        LabelingConfig, clip_region_scorer_jax)

    img = np.full((64, 64, 3), 120, np.uint8)
    img[8:56, 4:28] = [210, 40, 40]    # red region
    img[8:56, 36:60] = [40, 210, 40]   # green region
    m_red = np.zeros((64, 64), bool)
    m_red[8:56, 4:28] = True
    m_green = np.zeros((64, 64), bool)
    m_green[8:56, 36:60] = True
    m_bg = np.zeros((64, 64), bool)
    m_bg[:8, :8] = True
    masks = np.stack([m_red, m_green, m_bg])

    for backend in ("host", "device"):
        scorer = clip_region_scorer_jax(vision_apply, temb, crop_size=16,
                                        capacity=4, vision_params=proj,
                                        crop_backend=backend)
        ids, probs = scorer(img, masks)
        assert ids[0] == 0 and ids[1] == 1, (backend, ids, probs)
        # informative scores: the matched color wins decisively
        assert probs[0] > 0.9 and probs[1] > 0.9, (backend, probs)

    # ---- class-match selection core: wrong-class detection scores HIGHER
    maskness = np.array([0.9, 0.6, 0.8], np.float32)  # red > bg > green
    det = {"masks": masks, "scores": maskness * probs,
           "class_ids": np.asarray(ids, np.int32)}

    class W:
        def __init__(self):
            self.records = []

        def write(self, rec):
            self.records.append(rec)
            return True

    # target = green (class 1): must select green despite red's higher score
    w = W()
    assert _save_detection(det, {"image_id": "a", "class_id": 1}, w,
                           LabelingConfig(topk=2), rle_codec)
    assert w.records[0]["pred_classes"][0] == 1
    sel = rle_codec.decode(w.records[0]["object_masks"][0])
    assert (sel & m_green).sum() / max((sel | m_green).sum(), 1) > 0.99

    # synset-mismatch fallback: class 7 has no match -> keep-all by score
    w2 = W()
    assert _save_detection(det, {"image_id": "b", "class_id": 7}, w2,
                           LabelingConfig(topk=3), rle_codec)
    assert w2.records[0]["pred_classes"][0] == 0  # red: top combined score
    assert len(w2.records[0]["scores"]) == 3      # fallback kept ALL dets

    # the jit selection core agrees with the numpy save path on both cases
    for target, want_first in ((1, 1), (7, 0)):
        idx, _, valid = select_class_matched_topk(
            jnp.asarray(det["scores"]), jnp.asarray(det["class_ids"]),
            jnp.ones(3, bool), jnp.asarray(target), LabelingConfig(topk=3))
        first = int(np.asarray(det["class_ids"])[int(idx[0])])
        assert first == want_first and bool(valid[0])
