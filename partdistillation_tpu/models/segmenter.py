"""Full Mask2Former-style segmenter: Swin backbone -> deformable pixel decoder
-> masked transformer decoder.

This is the shared network trunk of the reference's task models
(ProposalModel / PartDistillationModel / SupervisedModel all compose
build_backbone + MaskFormerHead, e.g. part_distillation/proposal_model.py:31 via
modeling/meta_arch/mask_former_head.py:22-143). Task-specific behavior (losses,
pseudo-label IO, inference post-processing) lives in models/meta_arch/.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .fpn import FPNPixelDecoderConfig, build_pixel_decoder
from .maskformer_decoder import StandardDecoderConfig, StandardTransformerDecoder
from .pixel_decoder import PixelDecoderConfig
from .swin import SwinConfig, SwinTransformer
from .transformer_decoder import (
    MultiScaleMaskedTransformerDecoder,
    PartDistillationTransformerDecoder,
    TransformerDecoderConfig,
)

__all__ = ["SegmenterConfig", "MaskFormerSegmenter"]

# ImageNet normalization used by every reference config
# (Base-COCO-InstanceSegmentation.yaml PIXEL_MEAN/STD).
PIXEL_MEAN = (123.675, 116.280, 103.530)
PIXEL_STD = (58.395, 57.120, 57.375)


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    swin: SwinConfig = SwinConfig()
    pixel_decoder: PixelDecoderConfig = PixelDecoderConfig()
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    freeze_backbone: bool = False
    freeze_pixel_decoder: bool = False
    # Alternative heads (reference PIXEL_DECODER_NAME / TRANSFORMER_DECODER_NAME
    # registry dispatch, fpn.py:25-37, maskformer_transformer_decoder.py:25-30).
    # pixel_decoder_type: "msdeform" (production) | "fpn" | "transformer_fpn"
    # decoder_type: "multi_scale" (Mask2Former) | "standard" (MaskFormer v1)
    pixel_decoder_type: str = "msdeform"
    fpn: FPNPixelDecoderConfig = FPNPixelDecoderConfig()
    decoder_type: str = "multi_scale"
    standard_decoder: StandardDecoderConfig = StandardDecoderConfig()

    @property
    def uses_part_head(self) -> bool:
        return self.decoder.num_object_classes > 0


class MaskFormerSegmenter(nn.Module):
    cfg: SegmenterConfig

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3), normalized float
        train: bool = False,
        gt_object_class: Optional[jnp.ndarray] = None,
    ) -> dict:
        import jax

        # named scopes group profiler traces by pipeline component
        # (SURVEY.md §5 tracing: the JAX-profiler analog of per-stage timing)
        with jax.named_scope("backbone"):
            feats = SwinTransformer(self.cfg.swin, name="backbone")(images, train=train)
        if self.cfg.freeze_backbone:
            # stage-3/5 launches freeze the trunk (train_multi.sh:8
            # freeze_keys='["backbone","encoder"]'). stop_gradient here does
            # what DDP-freezing did — and on TPU it also releases all trunk
            # backward activations (the dominant HBM term at 640^2).
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        pd_cfg = (self.cfg.pixel_decoder if self.cfg.pixel_decoder_type == "msdeform"
                  else self.cfg.fpn)
        with jax.named_scope("pixel_decoder"):
            mask_features, encoder_feature, ms_feats = build_pixel_decoder(
                self.cfg.pixel_decoder_type, pd_cfg
            )(feats)
        if self.cfg.freeze_pixel_decoder:
            mask_features = jax.lax.stop_gradient(mask_features)
            ms_feats = [jax.lax.stop_gradient(f) for f in ms_feats]
            if encoder_feature is not None:
                encoder_feature = jax.lax.stop_gradient(encoder_feature)

        with jax.named_scope("transformer_decoder"):
            if self.cfg.decoder_type == "standard":
                # v1 path: queries attend one map — the pixel decoder's
                # transformer output when present, else the RAW coarsest
                # backbone feature (the reference default
                # TRANSFORMER_IN_FEATURE='res5': a plain-FPN pixel decoder
                # pairs with transformer_predictor(in_channels=res5),
                # mask_former_head.py:129-143).
                src = (encoder_feature if encoder_feature is not None
                       else feats["res5"])
                out = StandardTransformerDecoder(
                    self.cfg.standard_decoder, name="predictor")(src, mask_features)
            else:
                decoder_cls = (
                    PartDistillationTransformerDecoder
                    if self.cfg.uses_part_head
                    else MultiScaleMaskedTransformerDecoder
                )
                out = decoder_cls(self.cfg.decoder, name="predictor")(
                    ms_feats, mask_features, gt_object_class=gt_object_class
                )
        out["mask_features"] = mask_features
        out["backbone_features"] = feats
        return out
