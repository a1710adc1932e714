"""Torch Mask2Former checkpoint -> flax params conversion."""

import numpy as np
import pytest

from partdistillation_tpu.utils.convert_weights import (
    convert_mask2former_state_dict,
)


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import (
        MaskFormerSegmenter,
        SegmenterConfig,
    )
    from partdistillation_tpu.models.swin import SwinConfig
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig,
    )

    cfg = SegmenterConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                        window_size=4, drop_path_rate=0.0),
        pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32,
                                         transformer_layers=1,
                                         transformer_ffn_dim=64, n_heads=4,
                                         n_points=2),
        decoder=TransformerDecoderConfig(num_classes=1, hidden_dim=32,
                                         num_queries=8, num_heads=4,
                                         dim_feedforward=64, dec_layers=2,
                                         mask_dim=32),
    )
    model = MaskFormerSegmenter(cfg)
    import jax.numpy as jnp

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    return model, params


def _shape(params, *path):
    node = params["params"]
    for p in path:
        node = node[p]
    return tuple(node.shape)


def test_swin_block_and_patch_embed_convert(tiny_model):
    model, params = tiny_model
    rng = np.random.RandomState(0)
    kh, kw, i, o = _shape(params, "backbone", "patch_embed", "kernel")
    d_in, d_qkv = _shape(params, "backbone", "stage0_block0", "attn", "qkv", "kernel")
    tbl = _shape(params, "backbone", "stage0_block0", "attn",
                 "relative_position_bias_table")
    sd = {
        "backbone.patch_embed.proj.weight": rng.randn(o, i, kh, kw).astype(np.float32),
        "backbone.patch_embed.proj.bias": rng.randn(o).astype(np.float32),
        "backbone.patch_embed.norm.weight": rng.randn(o).astype(np.float32),
        "backbone.patch_embed.norm.bias": rng.randn(o).astype(np.float32),
        "backbone.layers.0.blocks.0.attn.qkv.weight":
            rng.randn(d_qkv, d_in).astype(np.float32),
        "backbone.layers.0.blocks.0.attn.qkv.bias":
            rng.randn(d_qkv).astype(np.float32),
        "backbone.layers.0.blocks.0.attn.relative_position_bias_table":
            rng.randn(*tbl).astype(np.float32),
        "backbone.layers.0.blocks.0.attn.relative_position_index":
            np.zeros((16, 16), np.int64),
        "backbone.norm0.weight": rng.randn(16).astype(np.float32),
        "backbone.norm0.bias": rng.randn(16).astype(np.float32),
    }
    out, unmatched = convert_mask2former_state_dict(sd, params)
    assert unmatched == []
    # conv kernel transposed OIHW -> HWIO
    np.testing.assert_allclose(
        np.asarray(out["params"]["backbone"]["patch_embed"]["kernel"]),
        sd["backbone.patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    # dense transposed (out,in) -> (in,out)
    np.testing.assert_allclose(
        np.asarray(out["params"]["backbone"]["stage0_block0"]["attn"]["qkv"]["kernel"]),
        sd["backbone.layers.0.blocks.0.attn.qkv.weight"].T)
    # norm0 -> norm_res2 scale
    np.testing.assert_allclose(
        np.asarray(out["params"]["backbone"]["norm_res2"]["scale"]),
        sd["backbone.norm0.weight"])
    # untouched leaves remain from the template
    assert "stage1_block0" in out["params"]["backbone"]


def test_predictor_mha_and_heads_convert(tiny_model):
    model, params = tiny_model
    rng = np.random.RandomState(1)
    d = 32
    q_shape = _shape(params, "predictor", "query_feat")
    cls_shape = _shape(params, "predictor", "class_embed", "kernel")
    sd = {
        "sem_seg_head.predictor.query_feat.weight":
            rng.randn(*q_shape).astype(np.float32),
        "sem_seg_head.predictor.query_embed.weight":
            rng.randn(*q_shape).astype(np.float32),
        "sem_seg_head.predictor.transformer_self_attention_layers.0.self_attn.in_proj_weight":
            rng.randn(3 * d, d).astype(np.float32),
        "sem_seg_head.predictor.transformer_self_attention_layers.0.self_attn.in_proj_bias":
            rng.randn(3 * d).astype(np.float32),
        "sem_seg_head.predictor.transformer_self_attention_layers.0.self_attn.out_proj.weight":
            rng.randn(d, d).astype(np.float32),
        "sem_seg_head.predictor.transformer_self_attention_layers.0.self_attn.out_proj.bias":
            rng.randn(d).astype(np.float32),
        "sem_seg_head.predictor.transformer_self_attention_layers.0.norm.weight":
            rng.randn(d).astype(np.float32),
        "sem_seg_head.predictor.transformer_self_attention_layers.0.norm.bias":
            rng.randn(d).astype(np.float32),
        "sem_seg_head.predictor.transformer_cross_attention_layers.1.multihead_attn.in_proj_weight":
            rng.randn(3 * d, d).astype(np.float32),
        "sem_seg_head.predictor.transformer_cross_attention_layers.1.multihead_attn.out_proj.weight":
            rng.randn(d, d).astype(np.float32),
        "sem_seg_head.predictor.transformer_ffn_layers.0.linear1.weight":
            rng.randn(64, d).astype(np.float32),
        "sem_seg_head.predictor.transformer_ffn_layers.0.norm.weight":
            rng.randn(d).astype(np.float32),
        "sem_seg_head.predictor.class_embed.weight":
            rng.randn(cls_shape[1], cls_shape[0]).astype(np.float32),
        "sem_seg_head.predictor.class_embed.bias":
            rng.randn(cls_shape[1]).astype(np.float32),
        "sem_seg_head.predictor.mask_embed.layers.0.weight":
            rng.randn(d, d).astype(np.float32),
        "sem_seg_head.predictor.decoder_norm.weight":
            rng.randn(d).astype(np.float32),
    }
    out, unmatched = convert_mask2former_state_dict(sd, params)
    assert unmatched == []
    p = out["params"]["predictor"]
    # fused in_proj split: q slice transposed
    w = sd["sem_seg_head.predictor.transformer_self_attention_layers.0.self_attn.in_proj_weight"]
    np.testing.assert_allclose(np.asarray(p["layer0"]["self_attn"]["q_proj"]["kernel"]),
                               w[:d].T)
    np.testing.assert_allclose(np.asarray(p["layer0"]["self_attn"]["v_proj"]["kernel"]),
                               w[2 * d:].T)
    np.testing.assert_allclose(np.asarray(p["layer1"]["cross_attn"]["k_proj"]["kernel"]),
                               sd["sem_seg_head.predictor.transformer_cross_attention_layers.1.multihead_attn.in_proj_weight"][d:2 * d].T)
    np.testing.assert_allclose(np.asarray(p["class_embed"]["kernel"]),
                               sd["sem_seg_head.predictor.class_embed.weight"].T)


def test_pixel_decoder_convert_and_apply(tiny_model):
    import jax
    import jax.numpy as jnp

    model, params = tiny_model
    rng = np.random.RandomState(2)
    d = 32
    lvl = _shape(params, "pixel_decoder", "level_embed")
    off = _shape(params, "pixel_decoder", "layer0", "self_attn",
                 "sampling_offsets", "kernel")
    ip0 = _shape(params, "pixel_decoder", "input_proj0", "kernel")  # HWIO
    lat = _shape(params, "pixel_decoder", "fpn_lateral", "kernel")
    out_c = _shape(params, "pixel_decoder", "fpn_output", "kernel")
    mf = _shape(params, "pixel_decoder", "mask_features", "kernel")

    def _oihw(hwio):
        return (hwio[3], hwio[2], hwio[0], hwio[1])

    sd = {
        "sem_seg_head.pixel_decoder.transformer.level_embed":
            rng.randn(*lvl).astype(np.float32),
        "sem_seg_head.pixel_decoder.input_proj.0.0.weight":
            rng.randn(*_oihw(ip0)).astype(np.float32),
        "sem_seg_head.pixel_decoder.input_proj.0.1.weight":
            rng.randn(d).astype(np.float32),
        "sem_seg_head.pixel_decoder.transformer.encoder.layers.0.self_attn.sampling_offsets.weight":
            rng.randn(off[1], off[0]).astype(np.float32),
        "sem_seg_head.pixel_decoder.transformer.encoder.layers.0.linear1.weight":
            rng.randn(64, d).astype(np.float32),
        "sem_seg_head.pixel_decoder.transformer.encoder.layers.0.norm1.weight":
            rng.randn(d).astype(np.float32),
        "sem_seg_head.pixel_decoder.adapter_1.weight":
            rng.randn(*_oihw(lat)).astype(np.float32),
        "sem_seg_head.pixel_decoder.adapter_1.norm.weight":
            rng.randn(d).astype(np.float32),
        "sem_seg_head.pixel_decoder.layer_1.weight":
            rng.randn(*_oihw(out_c)).astype(np.float32),
        "sem_seg_head.pixel_decoder.mask_features.weight":
            rng.randn(*_oihw(mf)).astype(np.float32),
        "sem_seg_head.pixel_decoder.mask_features.bias":
            rng.randn(mf[3]).astype(np.float32),
    }
    out, unmatched = convert_mask2former_state_dict(sd, params)
    assert unmatched == []
    # converted params still drive the model
    y = jax.jit(lambda p, x: model.apply(p, x))(out, jnp.zeros((1, 64, 64, 3)))
    assert y["pred_masks"].shape[0] == 1


def test_unknown_and_mismatched_keys_reported(tiny_model):
    _, params = tiny_model
    sd = {
        "some.unknown.key": np.zeros((3,), np.float32),
        # class head of a different size (stage-5 scenario): skipped
        "sem_seg_head.predictor.class_embed.weight": np.zeros((99, 32), np.float32),
    }
    out, unmatched = convert_mask2former_state_dict(sd, params)
    assert "some.unknown.key" in unmatched
    assert "sem_seg_head.predictor.class_embed.weight" in unmatched
    # template value preserved
    assert out["params"]["predictor"]["class_embed"]["kernel"].shape[1] != 99


def test_migrate_legacy_keys_modern_wins_on_collision():
    """A checkpoint carrying both spellings keeps the modern one (matching
    the reference's delete-after-copy applied to an already-migrated dict)."""
    import numpy as np

    from partdistillation_tpu.utils.convert_weights import migrate_legacy_keys

    sd = {
        "sem_seg_head.predictor.static_query.weight": np.zeros(3),
        "sem_seg_head.predictor.query_feat.weight": np.ones(3),
        "sem_seg_head.pixel_decoder.pixel_decoder.mask_features.bias": np.zeros(2),
    }
    out = migrate_legacy_keys(sd)
    assert sorted(out) == ["sem_seg_head.pixel_decoder.mask_features.bias",
                           "sem_seg_head.predictor.query_feat.weight"]
    assert out["sem_seg_head.predictor.query_feat.weight"].sum() == 3.0
