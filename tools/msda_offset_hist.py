"""Measure the MSDA sampling-offset distribution (VERDICT r2 next-step #3).

The banded MSDA kernel (ops/ms_deform_attn.py mode="banded") is exact while
taps stay within `band_radius` rows of the query's reference point. Offsets
are exactly the `sampling_offsets` Dense output, in per-level pixel units
(attention.py:139-145 divides by the level normalizer):

* at init the Dense kernel is zero and the bias caps |offset| at n_points
  level pixels (the deformable-DETR rotated-grid init) — banded is exact;
* the stage-3/5 launch configs FREEZE the encoder (train_multi.sh:33-38),
  so in those runs the offsets never move from their checkpoint values;
* this tool measures how far offsets drift when the encoder is NOT frozen:
  it trains the tiny stage-3 model with every parameter live and reports
  per-level |dx|/|dy| percentiles plus the attention-mass out-of-band
  fraction at several radii (ops.ms_deform_attn.msda_band_oob_fraction).

Run on CPU: PYTHONPATH= JAX_PLATFORMS=cpu python tools/msda_offset_hist.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tiny_cfg(image_size: int):
    from partdistillation_tpu.losses.criterion import CriterionConfig
    from partdistillation_tpu.losses.matcher import MatcherConfig
    from partdistillation_tpu.models.meta_arch.proposal import ProposalModelConfig
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import SegmenterConfig
    from partdistillation_tpu.models.swin import SwinConfig
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig)

    seg = SegmenterConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8), window_size=4,
                        drop_path_rate=0.0),
        pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32,
                                         transformer_layers=2,
                                         transformer_ffn_dim=64, n_heads=4,
                                         n_points=4),
        decoder=TransformerDecoderConfig(num_classes=1, hidden_dim=32,
                                         num_queries=8, num_heads=4,
                                         dim_feedforward=64, dec_layers=2,
                                         mask_dim=32),
    )
    return ProposalModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=1, num_points=256,
                                  deep_supervision=True,
                                  matcher=MatcherConfig(num_points=256)))


def synthetic_batch(b, size, t=3, seed=0):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 255, (b, size, size, 3)).astype(np.float32)
    masks = np.zeros((b, t, size, size), bool)
    for bi in range(b):
        for ti in range(t):
            cy, cx = rng.randint(8, size - 8, 2)
            r = rng.randint(4, size // 3)
            yy, xx = np.mgrid[0:size, 0:size]
            masks[bi, ti] = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    return {"image": jnp.asarray(image), "masks": jnp.asarray(masks),
            "valid": jnp.ones((b, t), bool)}


def capture_offsets(cfg, params, batch):
    """Run the segmenter capturing every encoder layer's raw sampling offsets
    (level-pixel units) and softmaxed attention weights."""
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.segmenter import MaskFormerSegmenter

    model = MaskFormerSegmenter(cfg.segmenter)
    _, state = model.apply(
        params, normalize_images(batch["image"]),
        capture_intermediates=lambda mdl, _:
            mdl.name in ("sampling_offsets", "attention_weights"),
        mutable=["intermediates"])

    outs = []

    def walk(tree, path):
        if isinstance(tree, dict):
            if "__call__" in tree:
                outs.append((path, tree["__call__"][0]))
            else:
                for k, v in tree.items():
                    walk(v, path + (k,))

    walk(state["intermediates"], ())
    per_layer = {}
    for path, arr in outs:
        layer = "/".join(p for p in path if p.startswith("layer"))
        kind = path[-1]
        per_layer.setdefault(layer, {})[kind] = np.asarray(arr)
    return per_layer


def summarize(per_layer, shapes, m, p, radii=(4, 6, 8)):
    from partdistillation_tpu.models.pixel_decoder import _reference_points
    from partdistillation_tpu.ops.ms_deform_attn import msda_band_oob_fraction

    L = len(shapes)
    rows = []
    all_loc, all_w = [], []
    for layer, d in sorted(per_layer.items()):
        off = d["sampling_offsets"]
        b, lq = off.shape[:2]
        off = off.reshape(b, lq, m, L, p, 2)
        w = d["attention_weights"].reshape(b, lq, m, L * p)
        w = jax.nn.softmax(jnp.asarray(w), -1).reshape(b, lq, m, L, p)
        ref = np.asarray(_reference_points(shapes))[None, :, None]  # (1,S,1,L,2)
        norm = np.asarray([[wd, ht] for ht, wd in shapes], np.float32)
        loc = ref[:, :, :, :, None, :] + off / norm[None, None, None, :, None, :]
        all_loc.append(loc)
        all_w.append(np.asarray(w))
        for lvl in range(L):
            a = np.abs(off[..., lvl, :, :])
            rows.append({
                "layer": layer, "level": lvl, "hw": list(shapes[lvl]),
                "p50": round(float(np.percentile(a, 50)), 3),
                "p99": round(float(np.percentile(a, 99)), 3),
                "p999": round(float(np.percentile(a, 99.9)), 3),
                "max": round(float(a.max()), 3),
            })
    oob = {}
    for r in radii:
        fr = [float(msda_band_oob_fraction(shapes, jnp.asarray(lc),
                                           jnp.asarray(w_), radius=r))
              for lc, w_ in zip(all_loc, all_w)]
        oob[f"radius_{r}"] = round(float(np.mean(fr)), 6)
    return rows, oob


def main(steps=300, size=128, b=2):
    from partdistillation_tpu.engine.optim import OptimizerConfig
    from partdistillation_tpu.engine.trainer import Trainer
    from partdistillation_tpu.models.meta_arch.proposal import (
        make_loss_fn, normalize_images)
    from partdistillation_tpu.models.segmenter import MaskFormerSegmenter

    cfg = tiny_cfg(size)
    m = cfg.segmenter.pixel_decoder.n_heads
    p = cfg.segmenter.pixel_decoder.n_points
    s = size // 32
    shapes = ((s, s), (2 * s, 2 * s), (4 * s, 4 * s))  # res5-first

    batches = [synthetic_batch(b, size, seed=i) for i in range(8)]
    model = MaskFormerSegmenter(cfg.segmenter)
    params = model.init(jax.random.PRNGKey(0),
                        normalize_images(batches[0]["image"]))

    rows0, oob0 = summarize(capture_offsets(cfg, params, batches[0]),
                            shapes, m, p)
    print(json.dumps({"phase": "init", "offsets_px": rows0, "oob": oob0}))

    # train with NOTHING frozen (the worst case for offset drift; the launch
    # configs freeze the encoder, where offsets cannot move at all)
    trainer = Trainer(loss_fn=make_loss_fn(cfg), init_params=params,
                      optimizer_cfg=OptimizerConfig(
                          base_lr=1e-4, clip_norm=0.01, warmup_iters=10,
                          schedule="multistep", steps=()))
    for i in range(steps):
        mtr = trainer.train_step(batches[i % len(batches)])
    print(json.dumps({"final_loss": float(mtr["total_loss"]), "steps": steps}))

    rows1, oob1 = summarize(capture_offsets(cfg, trainer.state.params,
                                            batches[0]), shapes, m, p)
    print(json.dumps({"phase": f"trained_{steps}", "offsets_px": rows1,
                      "oob": oob1}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
