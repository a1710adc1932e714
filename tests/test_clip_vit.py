"""CLIP vision tower: parity vs transformers + the TPU region scorer.

The torch oracle is a randomly-initialized HF `CLIPVisionModelWithProjection`
(no download; the same offline pattern as tests/test_torch_parity.py): the
converted flax tower must reproduce its image embeddings to float tolerance —
the trust chain for stage-1 open-vocabulary region scoring on device
(reference analog: detic_labeling_net.py:50-68 CLIP classifier swap).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from partdistillation_tpu.models.clip_vit import (  # noqa: E402
    CLIPVisionTower,
    config_from_hf,
    convert_clip_vision_state_dict,
    normalize_clip_pixels,
)


def _small_hf_model(image_size=32, patch_size=8):
    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=image_size, patch_size=patch_size,
        projection_dim=16)
    torch.manual_seed(0)
    return transformers.CLIPVisionModelWithProjection(cfg).eval()


def test_parity_with_transformers():
    hf = _small_hf_model()
    cfg = config_from_hf(hf.config)
    params = convert_clip_vision_state_dict(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    pixels = rng.randn(3, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        want = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2)).image_embeds.numpy()

    got = np.asarray(CLIPVisionTower(cfg).apply(params, jnp.asarray(pixels)))
    assert got.shape == want.shape == (3, 16)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_resized_position_grid_runs():
    """Inputs at a non-pretraining size route through get_abs_pos resizing."""
    hf = _small_hf_model()
    cfg = config_from_hf(hf.config)
    params = convert_clip_vision_state_dict(hf.state_dict(), cfg)
    out = CLIPVisionTower(cfg).apply(
        params, jnp.zeros((2, 48, 48, 3)))  # 6x6 grid vs pretraining 4x4
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_region_scorer_jax_chunks_and_scores():
    from partdistillation_tpu.models.meta_arch.labeling import (
        clip_region_scorer_jax)

    proj_dim, n_classes = 8, 5
    rng = np.random.RandomState(1)
    text = rng.randn(n_classes, proj_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    w = rng.randn(3, proj_dim).astype(np.float32) * 0.01

    def vision_apply(px):  # deterministic fake tower: mean-pool channels @ w
        pooled = jnp.mean(px, axis=(1, 2))  # (N, 3)
        return pooled @ jnp.asarray(w)

    scorer = clip_region_scorer_jax(vision_apply, text, crop_size=16,
                                    capacity=2)
    image = rng.randint(0, 255, (24, 24, 3)).astype(np.uint8)
    masks = np.zeros((5, 24, 24), bool)  # 5 masks > capacity 2: chunked path
    for i in range(5):
        masks[i, i * 4 : i * 4 + 6, 2 : 20] = True

    ids, probs = scorer(image, masks)
    assert ids.shape == (5,) and probs.shape == (5,)
    assert (0 <= ids).all() and (ids < n_classes).all()
    assert (probs > 0).all() and (probs <= 1.0).all()

    # full-batch call agrees with the chunked one
    scorer_full = clip_region_scorer_jax(vision_apply, text, crop_size=16,
                                         capacity=8)
    ids2, probs2 = scorer_full(image, masks)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(probs, probs2, atol=1e-5)


def test_scorer_tpu_end_to_end_with_converted_tower():
    """The full convert->jit->score path against the torch reference scorer's
    math on the same crops (text side random, no checkpoint needed)."""
    from partdistillation_tpu.models.meta_arch.labeling import (
        clip_region_scorer_jax)

    hf = _small_hf_model()
    cfg = config_from_hf(hf.config)
    params = convert_clip_vision_state_dict(hf.state_dict(), cfg)
    tower = CLIPVisionTower(cfg)

    rng = np.random.RandomState(2)
    text = rng.randn(4, 16).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    scorer = clip_region_scorer_jax(
        lambda px: tower.apply(params, px), text, crop_size=cfg.image_size)

    image = rng.randint(0, 255, (40, 40, 3)).astype(np.uint8)
    masks = np.zeros((2, 40, 40), bool)
    masks[0, 5:25, 5:30] = True
    masks[1, 20:38, 0:40] = True
    ids, probs = scorer(image, masks)

    # torch oracle on the identical preprocessed crops
    from partdistillation_tpu.data.transforms import resize_image
    crops = []
    for m in masks:
        ys, xs = np.nonzero(m)
        crops.append(resize_image(
            image[ys.min():ys.max() + 1, xs.min():xs.max() + 1],
            (cfg.image_size, cfg.image_size)) / 255.0)
    batch = np.stack(crops).astype(np.float32)
    norm = np.asarray(normalize_clip_pixels(jnp.asarray(batch)))
    with torch.no_grad():
        emb = hf(torch.from_numpy(norm).permute(0, 3, 1, 2)).image_embeds.numpy()
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    sims = emb @ text.T
    e = np.exp(100.0 * (sims - sims.max(-1, keepdims=True)))
    want_probs = (e / e.sum(-1, keepdims=True))
    np.testing.assert_array_equal(ids, want_probs.argmax(-1))
    np.testing.assert_allclose(probs, want_probs.max(-1), atol=1e-3)


def test_region_scorer_device_crops_match_host():
    """crop_backend="device" (on-device bbox + scale_and_translate — the
    production default in clip_region_scorer_tpu) agrees with the host PIL
    crop path: same argmax class on well-separated regions, close probs.
    The host path stays the bit-exact torch-preprocessing oracle."""
    from partdistillation_tpu.models.meta_arch.labeling import (
        clip_region_scorer_jax)

    proj_dim, n_classes = 8, 5
    rng = np.random.RandomState(3)
    text = rng.randn(n_classes, proj_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    w = rng.randn(3, proj_dim).astype(np.float32) * 0.05

    def vision_apply(px):  # deterministic fake tower
        pooled = jnp.mean(px, axis=(1, 2))
        return pooled @ jnp.asarray(w)

    host = clip_region_scorer_jax(vision_apply, text, crop_size=16,
                                  capacity=4, crop_backend="host")
    dev = clip_region_scorer_jax(vision_apply, text, crop_size=16,
                                 capacity=4, crop_backend="device")

    # strongly-colored distinct regions so the class decision is not a
    # resize-roundoff coin flip
    image = np.zeros((48, 48, 3), np.uint8)
    image[4:20, 4:20] = [250, 10, 10]
    image[26:44, 8:40] = [10, 10, 250]
    image[10:40, 30:46] = [10, 250, 10]
    masks = np.zeros((3, 48, 48), bool)
    masks[0, 4:20, 4:20] = True
    masks[1, 26:44, 8:40] = True
    masks[2, 10:40, 30:46] = True

    ids_h, probs_h = host(image, masks)
    ids_d, probs_d = dev(image, masks)
    np.testing.assert_array_equal(ids_h, ids_d)
    np.testing.assert_allclose(probs_h, probs_d, atol=2e-2)


def test_region_scorer_batched_matches_per_image():
    """scorer.batched (one dispatch for a whole image batch — the
    run_labeling_batched / bench path) equals per-image device calls."""
    from partdistillation_tpu.models.meta_arch.labeling import (
        clip_region_scorer_jax)

    proj_dim, n_classes = 8, 5
    rng = np.random.RandomState(4)
    text = rng.randn(n_classes, proj_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    w = rng.randn(3, proj_dim).astype(np.float32) * 0.05

    def vision_apply(px):
        return jnp.mean(px, axis=(1, 2)) @ jnp.asarray(w)

    dev = clip_region_scorer_jax(vision_apply, text, crop_size=16,
                                 capacity=4, crop_backend="device")
    images = rng.randint(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    masks = np.zeros((3, 4, 32, 32), bool)
    for b in range(3):
        for k in range(4):
            y, x = rng.randint(0, 20), rng.randint(0, 20)
            masks[b, k, y : y + 10, x : x + 10] = True
    masks[1, 2] = False  # an empty mask exercises the full-image fallback

    ids_b, probs_b = dev.batched(images, masks)
    for b in range(3):
        ids_i, probs_i = dev(images[b].astype(np.float32), masks[b])
        np.testing.assert_array_equal(ids_b[b], ids_i)
        np.testing.assert_allclose(probs_b[b], probs_i, atol=1e-5)
