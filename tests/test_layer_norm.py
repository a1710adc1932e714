"""Fused LayerNorm (ops/layer_norm.py) vs the flax reference composition."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from partdistillation_tpu.ops.layer_norm import fused_layer_norm


def _ref_ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def test_fused_ln_matches_reference_f32():
    rng = np.random.RandomState(0)
    for shape in ((64, 192), (2, 10, 7, 384), (1, 33, 768)):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 3 + 1)
        scale = jnp.asarray(rng.rand(shape[-1]).astype(np.float32) + 0.5)
        bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        out = fused_layer_norm(x, scale, bias)
        ref = _ref_ln(x, scale, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_fused_ln_bf16_stats_in_f32():
    rng = np.random.RandomState(1)
    x32 = rng.randn(128, 256).astype(np.float32) * 2 + 100.0  # big mean
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    out = fused_layer_norm(jnp.asarray(x32, jnp.bfloat16), scale, bias)
    ref = _ref_ln(jnp.asarray(x32, jnp.bfloat16), scale, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_fused_ln_gradients_match_autodiff_of_reference():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(32, 192).astype(np.float32))
    scale = jnp.asarray(rng.rand(192).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(192).astype(np.float32))
    g = jnp.asarray(rng.randn(32, 192).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b) * g)

    def loss_ref(x, s, b):
        return jnp.sum(_ref_ln(x, s, b) * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_swin_ln_module_param_layout_and_parity():
    """models.swin.LN keeps nn.LayerNorm's {scale, bias} checkpoint keys and
    (fused or not) matches nn.LayerNorm at f32."""
    from partdistillation_tpu.models.swin import LN

    x = jnp.asarray(np.random.RandomState(3).randn(4, 9, 48), jnp.float32)
    for fused in (False, True):
        mod = LN(fused=fused)
        params = mod.init(jax.random.PRNGKey(0), x)
        assert set(params["params"].keys()) == {"scale", "bias"}
        out = mod.apply(params, x)
        ref = nn.LayerNorm(epsilon=1e-5).apply(
            {"params": params["params"]}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
