"""Stage-1 detection wire format: the bit-packed mask download must decode
to exactly the boolean masks (8x less device->host traffic — the dominant
term of the e2e detect loop over the axon tunnel, PERF.md round 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full suite only

from partdistillation_tpu.models.meta_arch.labeling import (
    make_proposal_detection_fn)
from partdistillation_tpu.models.meta_arch.proposal import ProposalModelConfig
from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
from partdistillation_tpu.models.segmenter import SegmenterConfig
from partdistillation_tpu.models.swin import SwinConfig
from partdistillation_tpu.models.transformer_decoder import (
    TransformerDecoderConfig)


def test_packed_masks_roundtrip():
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
    fn = make_proposal_detection_fn(cfg)

    from partdistillation_tpu.models.segmenter import MaskFormerSegmenter
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images

    model = MaskFormerSegmenter(seg)
    # 68 px: not divisible by 8 after /1 — exercises the pad-and-slice path
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 68, 68, 3)), jnp.uint8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 normalize_images(imgs[:1]))
    out = jax.jit(fn)(params, imgs)

    masks = np.asarray(out["masks"])
    packed = np.asarray(out["masks_packed"])
    w = masks.shape[-1]
    unpacked = np.unpackbits(packed, axis=-1)[..., :w].astype(bool)
    np.testing.assert_array_equal(unpacked, masks)
