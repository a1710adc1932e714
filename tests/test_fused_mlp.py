"""ops/fused_mlp: kernel-vs-composition numerics (the ops/test.py pattern)
and SwinBlock flag equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partdistillation_tpu.ops import fused_mlp as fm


def _inputs(n=70, c=24, f=96, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, c).astype(np.float32), dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32), dtype)
    bias = jnp.asarray(0.1 * rng.randn(c).astype(np.float32), dtype)
    w1 = jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.1, dtype)
    b1 = jnp.asarray(0.1 * rng.randn(f).astype(np.float32), dtype)
    w2 = jnp.asarray(rng.randn(f, c).astype(np.float32) * 0.1, dtype)
    b2 = jnp.asarray(0.1 * rng.randn(c).astype(np.float32), dtype)
    return x, scale, bias, w1, b1, w2, b2


def test_kernel_matches_composition_interpret():
    """Pallas kernel (interpret mode) vs the XLA composition; f32 exact-ish."""
    args = _inputs()
    ref = fm.ln_mlp_reference(*args, dtype=jnp.float32)
    out = fm._fwd_pallas(*args, eps=1e-5, token_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_pads_ragged_token_count():
    args = _inputs(n=37)
    ref = fm.ln_mlp_reference(*args, dtype=jnp.float32)
    out = fm._fwd_pallas(*args, eps=1e-5, token_tile=16, interpret=True)
    assert out.shape == ref.shape == (37, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dispatch_falls_back_off_tpu():
    """fused_ln_mlp == reference on CPU (dispatch takes the XLA path)."""
    args = _inputs()
    x = args[0].reshape(2, 5, 7, 24)
    out = fm.fused_ln_mlp(x, *args[1:])
    ref = fm.ln_mlp_reference(*args, dtype=jnp.float32).reshape(2, 5, 7, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_vjp_matches_composition():
    """The custom VJP (recompute via composition) equals autodiff of the
    composition — grads flow even though production trunks are frozen."""
    args = _inputs(n=33)

    def f_ref(*a):
        return fm.ln_mlp_reference(*a, dtype=jnp.float32).sum()

    g_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    grads = fm._fused_bwd(1e-5, 16, True, args, jnp.ones((33, 24), jnp.float32))
    for a, b in zip(grads, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_vjp_differentiates_kernel_numerics_at_bf16():
    """At bf16 the custom VJP is the gradient of the f32-stat composition
    matching the Pallas kernel's numerics path (ln_mlp_kernel_numerics),
    NOT of the bf16-stat ln_mlp_reference — backward and forward are the
    same function (ADVICE r4: kernel fwd used f32 stats, old VJP bf16)."""
    args = _inputs(n=33, dtype=jnp.bfloat16)

    def f_kernel(*a):
        return fm.ln_mlp_kernel_numerics(*a).astype(jnp.float32).sum()

    g_ref = jax.grad(f_kernel, argnums=tuple(range(7)))(*args)
    grads = fm._fused_bwd(1e-5, 16, True, args, jnp.ones((33, 24), jnp.bfloat16))
    for a, b in zip(grads, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-2, rtol=1e-2)
    # and the forward of that composition matches the kernel (interpret)
    out = fm._fwd_pallas(*args, eps=1e-5, token_tile=16, interpret=True)
    ref = fm.ln_mlp_kernel_numerics(*args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_swin_block_flag_equivalence():
    """fused_mlp=True equals the unfused block off-TPU (dispatch fallback
    shares numerics) with an IDENTICAL param tree."""
    from partdistillation_tpu.models.swin import SwinBlock

    kw = dict(dim=24, num_heads=4, window_size=4, shift_size=0,
              mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop_path=0.0,
              dtype=jnp.float32, fused_attention=False, fused_layernorm=False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 24), jnp.float32)

    blk0 = SwinBlock(fused_mlp=False, **kw)
    blk1 = SwinBlock(fused_mlp=True, **kw)
    p0 = blk0.init(jax.random.PRNGKey(0), x, deterministic=True)
    p1 = blk1.init(jax.random.PRNGKey(0), x, deterministic=True)
    # identical tree structure AND identical initialization
    assert (jax.tree_util.tree_structure(p0) ==
            jax.tree_util.tree_structure(p1))
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y0 = blk0.apply(p0, x, deterministic=True)
    y1 = blk1.apply(p0, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)


def test_branch_mode_kernel_matches_composition_interpret():
    """add_residual=False returns exactly the MLP branch (round-5
    stochastic-depth path)."""
    args = _inputs()
    ref = fm.ln_mlp_reference(*args, dtype=jnp.float32, add_residual=False)
    out = fm._fwd_pallas(*args, eps=1e-5, token_tile=16,
                         add_residual=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # branch + x == residual-mode output
    full = fm._fwd_pallas(*args, eps=1e-5, token_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out + args[0]), np.asarray(full),
                               atol=2e-5, rtol=2e-5)


def test_swin_block_stochastic_fused_equivalence():
    """With drop_path > 0 and deterministic=False, the branch-mode fused
    block equals the unfused block under the SAME dropout key (DropPath
    consumes one bernoulli either way; param trees identical)."""
    from partdistillation_tpu.models.swin import SwinBlock

    kw = dict(dim=24, num_heads=4, window_size=4, shift_size=0,
              mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop_path=0.5,
              dtype=jnp.float32, fused_attention=False, fused_layernorm=False)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 24), jnp.float32)

    blk0 = SwinBlock(fused_mlp=False, **kw)
    blk1 = SwinBlock(fused_mlp=True, fused_mlp_stochastic=True, **kw)
    p = blk0.init(jax.random.PRNGKey(0), x, deterministic=True)
    assert (jax.tree_util.tree_structure(p) ==
            jax.tree_util.tree_structure(
                blk1.init(jax.random.PRNGKey(0), x, deterministic=True)))
    rngs = {"dropout": jax.random.PRNGKey(7)}
    y0 = blk0.apply(p, x, deterministic=False, rngs=rngs)
    y1 = blk1.apply(p, x, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)
    # the stochastic path actually dropped someone (drop_path=0.5, 4 samples)
    det = blk0.apply(p, x, deterministic=True)
    assert not np.allclose(np.asarray(y0), np.asarray(det))
