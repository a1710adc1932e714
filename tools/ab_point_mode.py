"""A/B: criterion `point_mode="grid"` (TPU-native default) vs `"random"`
(reference-exact PointRend sampling, mask2former criterion.py:176-196).

Trains the tiny stage-3 ProposalModel twice from IDENTICAL init / data /
step keys, switching only `CriterionConfig.point_mode`, and reports the loss
trajectories plus an eval-style dense-mask loss computed on FULL-resolution
masks (no point sampling) so the two runs are scored by a mode-independent
yardstick. Writes the result into PERF.md-able JSON on stdout.

Run on CPU (tiny shapes): PYTHONPATH= JAX_PLATFORMS=cpu python tools/ab_point_mode.py
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(steps: int = 300, seed: int = 0, ratio: float = 0.75):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_train_e2e import init_params, synthetic_batch, tiny_cfg

    from partdistillation_tpu.engine.optim import OptimizerConfig
    from partdistillation_tpu.engine.trainer import Trainer
    from partdistillation_tpu.models.meta_arch.proposal import (
        make_loss_fn, normalize_images)
    from partdistillation_tpu.models.segmenter import MaskFormerSegmenter

    base = tiny_cfg()
    batches = [synthetic_batch(seed=seed * 100 + s) for s in range(8)]
    params0 = init_params(base, batches[0])

    def dense_eval_loss(cfg, params, batch):
        """Mode-independent yardstick: sigmoid-CE + dice on the FULL mask
        grid for the best-matching query per GT mask (no point sampling)."""
        model = MaskFormerSegmenter(cfg.segmenter)
        out = model.apply(params, normalize_images(batch["image"]))
        logits = out["pred_masks"]  # (B, Q, H/4, W/4)
        h, w = batch["masks"].shape[-2:]
        logits = jax.image.resize(
            logits, logits.shape[:2] + (h, w), "bilinear")
        gt = batch["masks"].astype(jnp.float32)  # (B, T, H, W)
        pr = jax.nn.sigmoid(logits)
        inter = jnp.einsum("bqhw,bthw->bqt", pr, gt)
        dice = 1.0 - (2 * inter + 1) / (
            pr.sum((-2, -1))[:, :, None] + gt.sum((-2, -1))[:, None] + 1)
        best = jnp.min(jnp.where(batch["valid"][:, None], dice, jnp.inf), axis=1)
        return float(jnp.mean(jnp.where(jnp.isfinite(best), best, 0.0)))

    results = {}
    for mode in ("grid", "random"):
        cfg = dataclasses.replace(
            base, criterion=dataclasses.replace(
                base.criterion, point_mode=mode,
                importance_sample_ratio=ratio))
        trainer = Trainer(
            loss_fn=make_loss_fn(cfg),
            init_params=jax.tree_util.tree_map(jnp.copy, params0),
            optimizer_cfg=OptimizerConfig(base_lr=5e-4, clip_norm=0.01,
                                          warmup_iters=10,
                                          schedule="multistep", steps=()),
        )
        losses = []
        for i in range(steps):
            m = trainer.train_step(batches[i % len(batches)])
            losses.append(float(m["total_loss"]))
        dense = np.mean([dense_eval_loss(cfg, trainer.state.params, b)
                         for b in batches])
        results[mode] = {
            "loss_first10": float(np.mean(losses[:10])),
            "loss_last10": float(np.mean(losses[-10:])),
            "dense_eval_dice_loss": float(dense),
        }
    g, r = results["grid"], results["random"]
    results["verdict"] = {
        "train_loss_rel_diff": abs(g["loss_last10"] - r["loss_last10"])
        / max(r["loss_last10"], 1e-9),
        "dense_eval_rel_diff": abs(g["dense_eval_dice_loss"] - r["dense_eval_dice_loss"])
        / max(r["dense_eval_dice_loss"], 1e-9),
        "steps": steps,
        "seed": seed,
        "importance_sample_ratio": ratio,
    }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0,
         float(sys.argv[3]) if len(sys.argv) > 3 else 0.75)
