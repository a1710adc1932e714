"""Tests for the MaskFormer-v1 alternative heads: FPN pixel decoders, the
vanilla DETR transformer, the StandardTransformerDecoder, and ViT helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate (-m 'not slow')

from partdistillation_tpu.models.detr_transformer import (
    DETRTransformerConfig,
    Transformer,
)
from partdistillation_tpu.models.fpn import (
    BasePixelDecoder,
    FPNPixelDecoderConfig,
    TransformerEncoderPixelDecoder,
)
from partdistillation_tpu.models.maskformer_decoder import (
    StandardDecoderConfig,
    StandardTransformerDecoder,
)
from partdistillation_tpu.models import vit_utils


def _features(b=2, c0=16, h=32, w=32):
    rng = np.random.RandomState(0)
    feats = {}
    for i, name in enumerate(["res2", "res3", "res4", "res5"]):
        s = 2**i
        feats[name] = jnp.asarray(
            rng.randn(b, h // s, w // s, c0 * 2**i).astype(np.float32))
    return feats


FPN_CFG = FPNPixelDecoderConfig(conv_dim=32, mask_dim=24, transformer_enc_layers=1,
                                n_heads=4, transformer_ffn_dim=64)


@pytest.mark.parametrize("cls", [BasePixelDecoder, TransformerEncoderPixelDecoder])
def test_fpn_pixel_decoder_shapes(cls):
    feats = _features()
    mod = cls(FPN_CFG)
    params = mod.init(jax.random.PRNGKey(0), feats)
    mask_features, enc, ms = mod.apply(params, feats)
    # mask_features at the finest (res2) resolution
    assert mask_features.shape == (2, 32, 32, 24)
    # three coarsest maps, coarse -> fine (strides 32/16/8 analog: 4/8/16 here)
    assert [m.shape[1] for m in ms] == [4, 8, 16]
    assert all(m.shape[-1] == 32 for m in ms)
    if cls is BasePixelDecoder:
        assert enc is None
    else:
        assert enc.shape == (2, 4, 4, 32)


def test_detr_transformer_shapes_and_intermediates():
    cfg = DETRTransformerConfig(d_model=32, num_heads=4, dim_feedforward=64,
                                num_encoder_layers=2, num_decoder_layers=3,
                                return_intermediate=True)
    src = jnp.asarray(np.random.RandomState(1).randn(2, 20, 32).astype(np.float32))
    qe = jnp.asarray(np.random.RandomState(2).randn(7, 32).astype(np.float32))
    mod = Transformer(cfg)
    params = mod.init(jax.random.PRNGKey(0), src, qe)
    hs, memory = mod.apply(params, src, qe)
    assert hs.shape == (3, 2, 7, 32)
    assert memory.shape == (2, 20, 32)
    # intermediates must differ layer to layer
    assert not np.allclose(np.asarray(hs[0]), np.asarray(hs[-1]))


def test_detr_transformer_padding_mask_blocks_keys():
    """A fully-padded key position must not influence the output."""
    cfg = DETRTransformerConfig(d_model=16, num_heads=2, dim_feedforward=32,
                                num_encoder_layers=1, num_decoder_layers=1,
                                return_intermediate=False)
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(1, 6, 16).astype(np.float32))
    qe = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    pad = jnp.asarray([[False, False, False, False, True, True]])
    mod = Transformer(cfg)
    params = mod.init(jax.random.PRNGKey(0), src, qe, key_padding_mask=pad)
    hs1, _ = mod.apply(params, src, qe, key_padding_mask=pad)
    src2 = src.at[:, 4:].set(99.0)  # perturb only padded positions
    hs2, _ = mod.apply(params, src2, qe, key_padding_mask=pad)
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs2), atol=1e-5)


@pytest.mark.parametrize("pre_norm", [False, True])
def test_standard_decoder_outputs(pre_norm):
    cfg = StandardDecoderConfig(num_classes=3, hidden_dim=32, num_queries=9,
                                num_heads=4, dim_feedforward=64, enc_layers=0,
                                dec_layers=2, pre_norm=pre_norm, mask_dim=24)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 32).astype(np.float32))
    mask_features = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    mod = StandardTransformerDecoder(cfg)
    params = mod.init(jax.random.PRNGKey(0), x, mask_features)
    out = mod.apply(params, x, mask_features)
    assert out["pred_logits"].shape == (2, 9, 4)
    assert out["pred_masks"].shape == (2, 9, 16, 16)
    assert len(out["aux_outputs"]) == 1  # dec_layers - 1
    assert out["decoder_output"].shape == (2, 9, 32)


def test_segmenter_with_v1_heads():
    """End-to-end: Swin + transformer-FPN + standard decoder via config."""
    from partdistillation_tpu.models.segmenter import MaskFormerSegmenter, SegmenterConfig
    from partdistillation_tpu.models.swin import SwinConfig

    cfg = SegmenterConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                        window_size=4, drop_path_rate=0.0),
        pixel_decoder_type="transformer_fpn",
        fpn=FPN_CFG,
        decoder_type="standard",
        standard_decoder=StandardDecoderConfig(
            num_classes=1, hidden_dim=32, num_queries=9, num_heads=4,
            dim_feedforward=64, enc_layers=0, dec_layers=2, mask_dim=24),
    )
    model = MaskFormerSegmenter(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    out = jax.jit(lambda p, x: model.apply(p, x))(params, img)
    assert out["pred_logits"].shape == (1, 9, 2)
    assert out["pred_masks"].shape == (1, 9, 16, 16)


# ---------------------------------------------------------------- ViT utils


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 14, 8).astype(np.float32))
    wins, pad_hw = vit_utils.window_partition(x, 4)
    assert pad_hw == (12, 16)
    assert wins.shape == (2 * 3 * 4, 4, 4, 8)
    back = vit_utils.window_unpartition(wins, 4, pad_hw, (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_get_rel_pos_identity_when_sized():
    table = jnp.asarray(np.arange(9 * 4, dtype=np.float32).reshape(9, 4))
    out = vit_utils.get_rel_pos(5, 5, table)  # 2*5-1 == 9, no resize
    assert out.shape == (5, 5, 4)
    # relative index of (q=i, k=j) is (i - j) + 4
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(table[4]))
    np.testing.assert_allclose(np.asarray(out[4, 0]), np.asarray(table[8]))
    np.testing.assert_allclose(np.asarray(out[0, 4]), np.asarray(table[0]))


def test_add_decomposed_rel_pos_matches_naive():
    rng = np.random.RandomState(0)
    b, qh, qw, kh, kw, c = 2, 3, 4, 3, 4, 8
    attn = jnp.asarray(rng.randn(b, qh * qw, kh * kw).astype(np.float32))
    q = jnp.asarray(rng.randn(b, qh * qw, c).astype(np.float32))
    rph = jnp.asarray(rng.randn(2 * max(qh, kh) - 1, c).astype(np.float32))
    rpw = jnp.asarray(rng.randn(2 * max(qw, kw) - 1, c).astype(np.float32))
    out = vit_utils.add_decomposed_rel_pos(attn, q, rph, rpw, (qh, qw), (kh, kw))

    rh = np.asarray(vit_utils.get_rel_pos(qh, kh, rph))
    rw = np.asarray(vit_utils.get_rel_pos(qw, kw, rpw))
    qn = np.asarray(q).reshape(b, qh, qw, c)
    expect = np.asarray(attn).reshape(b, qh, qw, kh, kw).copy()
    for bi in range(b):
        for i in range(qh):
            for j in range(qw):
                for ki in range(kh):
                    for kj in range(kw):
                        expect[bi, i, j, ki, kj] += qn[bi, i, j] @ rh[i, ki]
                        expect[bi, i, j, ki, kj] += qn[bi, i, j] @ rw[j, kj]
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, qh, qw, kh, kw), expect, atol=1e-4)


def test_get_abs_pos_resizes_and_strips_cls():
    pe = jnp.asarray(np.random.RandomState(0).randn(1, 17, 6).astype(np.float32))
    out = vit_utils.get_abs_pos(pe, True, (8, 8))
    assert out.shape == (1, 8, 8, 6)


def test_patch_embed():
    mod = vit_utils.PatchEmbed(embed_dim=12, patch_size=(4, 4), stride=(4, 4))
    x = jnp.zeros((2, 32, 32, 3))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 8, 8, 12)
