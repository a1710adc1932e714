"""Matcher + SetCriterion unit tests on constructed cases."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from partdistillation_tpu.losses.criterion import CriterionConfig, set_criterion
from partdistillation_tpu.losses.matcher import (
    MatcherConfig,
    batch_dice_cost,
    batch_sigmoid_ce_cost,
    hungarian_match,
)


def make_case(b=2, q=6, t=3, h=16, w=16, k=2, seed=0, perfect=True):
    """Targets are blocks; queries t..2t-1 predict them (shifted by t)."""
    rng = np.random.RandomState(seed)
    tgt_masks = np.zeros((b, t, h, w), np.float32)
    for bi in range(b):
        for ti in range(t):
            tgt_masks[bi, ti, :, ti * (w // t) : (ti + 1) * (w // t)] = 1.0
    pred_masks = np.full((b, q, h, w), -8.0, np.float32)
    for bi in range(b):
        for ti in range(t):
            pred_masks[bi, t + ti] = np.where(tgt_masks[bi, ti] > 0, 8.0, -8.0)
    if not perfect:
        pred_masks += rng.randn(*pred_masks.shape) * 0.1
    labels = rng.randint(0, k, (b, t)).astype(np.int32)
    logits = np.zeros((b, q, k + 1), np.float32)
    logits[..., -1] = 3.0  # default: confident no-object
    for bi in range(b):
        for ti in range(t):
            logits[bi, t + ti, :] = 0.0
            logits[bi, t + ti, labels[bi, ti]] = 5.0
    valid = np.ones((b, t), bool)
    outputs = {"pred_logits": jnp.asarray(logits), "pred_masks": jnp.asarray(pred_masks)}
    targets = {
        "labels": jnp.asarray(labels),
        "masks": jnp.asarray(tgt_masks),
        "valid": jnp.asarray(valid),
    }
    return outputs, targets


def test_matcher_finds_planted_assignment():
    outputs, targets = make_case()
    matched = np.asarray(
        hungarian_match(outputs, targets, jax.random.PRNGKey(0), MatcherConfig(num_points=512))
    )
    # target slot ti should match query t+ti
    t = targets["labels"].shape[1]
    np.testing.assert_array_equal(matched, np.tile(np.arange(t) + t, (2, 1)))


def test_matcher_padding_does_not_steal():
    outputs, targets = make_case()
    b, t = targets["labels"].shape
    # add 2 padded slots
    targets_pad = {
        "labels": jnp.concatenate([targets["labels"], jnp.zeros((b, 2), jnp.int32)], 1),
        "masks": jnp.concatenate(
            [targets["masks"], jnp.zeros((b, 2) + targets["masks"].shape[2:])], 1
        ),
        "valid": jnp.concatenate([targets["valid"], jnp.zeros((b, 2), bool)], 1),
    }
    matched = np.asarray(
        hungarian_match(outputs, targets_pad, jax.random.PRNGKey(0), MatcherConfig(num_points=512))
    )
    np.testing.assert_array_equal(matched[:, :t], np.tile(np.arange(t) + t, (b, 1)))


def test_cost_formulas_match_reference_math():
    rng = np.random.RandomState(0)
    q, t, p = 4, 3, 50
    inp = rng.randn(q, p).astype(np.float32)
    tgt = (rng.rand(t, p) < 0.5).astype(np.float32)

    dice = np.asarray(batch_dice_cost(jnp.asarray(inp), jnp.asarray(tgt)))
    ce = np.asarray(batch_sigmoid_ce_cost(jnp.asarray(inp), jnp.asarray(tgt)))

    sig = 1 / (1 + np.exp(-inp.astype(np.float64)))
    for qi in range(q):
        for ti in range(t):
            num = 2 * (sig[qi] * tgt[ti]).sum()
            den = sig[qi].sum() + tgt[ti].sum()
            np.testing.assert_allclose(dice[qi, ti], 1 - (num + 1) / (den + 1), rtol=1e-4)
            bce = -(tgt[ti] * np.log(sig[qi]) + (1 - tgt[ti]) * np.log(1 - sig[qi]))
            np.testing.assert_allclose(ce[qi, ti], bce.mean(), rtol=1e-4)


def test_point_loss_formulas_closed_form():
    from partdistillation_tpu.losses.criterion import point_losses

    logits = jnp.full((64,), 3.0)
    labels = jnp.ones((64,))
    ce, dice = point_losses(logits, labels)
    sig = 1 / (1 + np.exp(-3.0))
    np.testing.assert_allclose(ce, np.log(1 + np.exp(-3.0)), rtol=1e-5)
    np.testing.assert_allclose(dice, 1 - (2 * sig * 64 + 1) / (sig * 64 + 64 + 1), rtol=1e-5)

    # mixed labels
    rng = np.random.RandomState(0)
    lg = rng.randn(100).astype(np.float32)
    lb = (rng.rand(100) < 0.5).astype(np.float32)
    ce, dice = point_losses(jnp.asarray(lg), jnp.asarray(lb))
    sg = 1 / (1 + np.exp(-lg.astype(np.float64)))
    bce = -(lb * np.log(sg) + (1 - lb) * np.log(1 - sg))
    np.testing.assert_allclose(ce, bce.mean(), rtol=1e-4)
    np.testing.assert_allclose(
        dice, 1 - (2 * (sg * lb).sum() + 1) / (sg.sum() + lb.sum() + 1), rtol=1e-4
    )


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_criterion_uniform_masks_large():
    """Large uniform masks (no importance sampling): near-closed-form loss."""
    b, q, t, h, w = 1, 2, 1, 128, 128
    logit = 3.0
    outputs = {
        "pred_logits": jnp.array([[[5.0, 0.0], [0.0, 5.0]]]),  # q0 -> class 0
        "pred_masks": jnp.full((b, q, h, w), logit),
    }
    targets = {
        "labels": jnp.zeros((b, t), jnp.int32),
        "masks": jnp.ones((b, t, h, w)),
        "valid": jnp.ones((b, t), bool),
    }
    cfg = CriterionConfig(num_classes=1, num_points=2048, deep_supervision=False,
                          importance_sample_ratio=0.0,
                          matcher=MatcherConfig(num_points=64),
                          point_mode="random")
    total, losses = set_criterion(outputs, targets, jax.random.PRNGKey(0), cfg)

    # ~1.5% of points touch the half-pixel edge bleed zone -> loose tolerance
    np.testing.assert_allclose(losses["loss_mask"], np.log(1 + np.exp(-logit)), rtol=0.35)
    sig = 1 / (1 + np.exp(-logit))
    np.testing.assert_allclose(losses["loss_dice"], 1 - 2 * sig / (sig + 1), atol=0.02)

    # weighted CE: q0 matched (w=1), q1 no-object (w=0.1); exact
    nll = -np.log(np.exp(5) / (np.exp(5) + 1))
    want = (1.0 * nll + 0.1 * nll) / 1.1
    np.testing.assert_allclose(losses["loss_ce"], want, rtol=1e-5)

    # grid mode: same estimator in expectation — average over jitter keys
    # (a single draw can put a whole correlated grid row in the edge zone)
    cfg_g = dataclasses.replace(cfg, point_mode="grid",
                                matcher=dataclasses.replace(cfg.matcher,
                                                            point_mode="grid"))
    vals = [float(set_criterion(outputs, targets, jax.random.PRNGKey(s), cfg_g)[1]["loss_mask"])
            for s in range(6)]
    np.testing.assert_allclose(np.mean(vals), np.log(1 + np.exp(-logit)), rtol=0.35)


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_criterion_permutation_and_padding_invariance():
    outputs, targets = make_case(perfect=False, seed=3)
    cfg = CriterionConfig(num_classes=2, num_points=256, deep_supervision=False,
                          matcher=MatcherConfig(num_points=256))
    key = jax.random.PRNGKey(1)
    total1, _ = set_criterion(outputs, targets, key, cfg)

    perm = np.array([2, 0, 1])
    targets_p = {
        "labels": targets["labels"][:, perm],
        "masks": targets["masks"][:, perm],
        "valid": targets["valid"][:, perm],
    }
    total2, _ = set_criterion(outputs, targets_p, key, cfg)
    # per-slot point-sampling keys differ under permutation -> stochastic wiggle
    np.testing.assert_allclose(total1, total2, rtol=8e-2)

    b = 2
    targets_pad = {
        "labels": jnp.concatenate([targets["labels"], jnp.zeros((b, 3), jnp.int32)], 1),
        "masks": jnp.concatenate(
            [targets["masks"], jnp.zeros((b, 3) + targets["masks"].shape[2:])], 1
        ),
        "valid": jnp.concatenate([targets["valid"], jnp.zeros((b, 3), bool)], 1),
    }
    total3, _ = set_criterion(outputs, targets_pad, key, cfg)
    np.testing.assert_allclose(total1, total3, rtol=8e-2)


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_criterion_deep_supervision_and_grads():
    outputs, targets = make_case(perfect=False, seed=4)
    outputs["aux_outputs"] = [
        {"pred_logits": outputs["pred_logits"] * 0.9, "pred_masks": outputs["pred_masks"] * 0.9}
    ]
    cfg = CriterionConfig(num_classes=2, num_points=128, matcher=MatcherConfig(num_points=128))

    def loss_fn(masks):
        o = dict(outputs)
        o["pred_masks"] = masks
        total, losses = set_criterion(o, targets, jax.random.PRNGKey(0), cfg)
        return total

    g = jax.grad(loss_fn)(outputs["pred_masks"])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

    _, losses = set_criterion(outputs, targets, jax.random.PRNGKey(0), cfg)
    assert "loss_ce_0" in losses and "loss_mask_0" in losses


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_criterion_psum_normalization():
    """num_masks normalization under shard_map matches the global compute."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    outputs, targets = make_case(b=8, q=6, t=3, perfect=False, seed=5)
    cfg = CriterionConfig(num_classes=2, num_points=64, deep_supervision=False,
                          matcher=MatcherConfig(num_points=64))
    mesh = Mesh(np.array(jax.devices()), ("data",))
    key = jax.random.PRNGKey(0)

    def local_loss(out, tgt):
        # every shard uses the same key: point sets differ from the global run,
        # so compare loss magnitudes, not exact values
        total, _ = set_criterion(out, tgt, key, cfg, axis_name="data")
        return jax.lax.pmean(total, "data")

    sharded = shard_map(
        local_loss, mesh=mesh,
        in_specs=({"pred_logits": P("data"), "pred_masks": P("data")},
                  {"labels": P("data"), "masks": P("data"), "valid": P("data")}),
        out_specs=P(),
    )
    out_small = {k: outputs[k] for k in ("pred_logits", "pred_masks")}
    total_sharded = float(sharded(out_small, targets))
    total_global, _ = set_criterion(outputs, targets, key, cfg)
    # same data + normalization semantics; point sets differ per shard -> loose
    np.testing.assert_allclose(total_sharded, float(total_global), rtol=1.5e-1)
