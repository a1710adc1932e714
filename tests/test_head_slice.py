"""PD_HEAD_SLICE=onehot (scatter-free giant head) vs the gather formulation:
identical logits and identical kernel/bias gradients (the backward becomes a
dense matmul instead of a scatter-add — the stage-5 donation-fault bisection
lever, PERF.md round-3 negative result #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full suite only

from partdistillation_tpu.models.transformer_decoder import (
    PartDistillationTransformerDecoder,
    TransformerDecoderConfig,
)


def _setup():
    cfg = TransformerDecoderConfig(num_classes=4, hidden_dim=32, num_queries=8,
                                   num_heads=4, dim_feedforward=64,
                                   dec_layers=2, mask_dim=32,
                                   num_object_classes=16, num_parts=4)
    model = PartDistillationTransformerDecoder(cfg)
    rng = np.random.RandomState(0)
    ms = [jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32)),
          jnp.asarray(rng.randn(2, 4, 4, 32).astype(np.float32)),
          jnp.asarray(rng.randn(2, 2, 2, 32).astype(np.float32))]
    mf = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    goc = jnp.asarray([3, 11], jnp.int32)
    return model, ms, mf, goc


def test_onehot_head_matches_gather(monkeypatch):
    model, ms, mf, goc = _setup()
    params = model.init(jax.random.PRNGKey(0), ms, mf, gt_object_class=goc)

    def loss(p):
        out = model.apply(p, ms, mf, gt_object_class=goc)
        return (jnp.sum(out["pred_logits"] ** 2)
                + sum(jnp.sum(a["pred_logits"] ** 2)
                      for a in out["aux_outputs"]))

    monkeypatch.setenv("PD_HEAD_SLICE", "gather")
    out_g = model.apply(params, ms, mf, gt_object_class=goc)
    l_g, grads_g = jax.value_and_grad(loss)(params)

    monkeypatch.setenv("PD_HEAD_SLICE", "onehot")
    out_o = model.apply(params, ms, mf, gt_object_class=goc)
    l_o, grads_o = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(np.asarray(out_o["pred_logits"]),
                               np.asarray(out_g["pred_logits"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(l_o), float(l_g), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(grads_o),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(grads_g),
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=str(pa))
