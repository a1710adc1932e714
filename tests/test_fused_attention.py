"""Fused masked attention: kernel (interpret mode) vs XLA composition,
mask semantics, gradient path, decoder integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partdistillation_tpu.ops.fused_attention import (
    _fused_fwd_pallas,
    attention_reference,
    fused_masked_attention,
)


def _inputs(rng, b=2, h=4, q=37, k=300, d=32, dtype=np.float32):
    return (jnp.asarray(rng.randn(b, h, q, d).astype(dtype)),
            jnp.asarray(rng.randn(b, h, k, d).astype(dtype)),
            jnp.asarray(rng.randn(b, h, k, d).astype(dtype)),
            jnp.asarray(rng.rand(b, 1, q, k) < 0.5))


def _neg(mask):
    allb = jnp.all(mask, -1, keepdims=True)
    return jnp.where(mask & ~allb, jnp.float32(-1e9), 0.0)


def test_kernel_matches_reference_interpret():
    rng = np.random.RandomState(0)
    q, k, v, mask = _inputs(rng)
    ref = attention_reference(q, k, v, _neg(mask))
    out = _fused_fwd_pallas(q, k, v, _neg(mask), 128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_kernel_unpadded_shapes_interpret():
    rng = np.random.RandomState(1)
    # already-aligned shapes (no padding path)
    q, k, v, mask = _inputs(rng, q=128, k=256)
    ref = attention_reference(q, k, v, _neg(mask))
    out = _fused_fwd_pallas(q, k, v, _neg(mask), 128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_all_blocked_rows_unblock():
    rng = np.random.RandomState(2)
    q, k, v, mask = _inputs(rng, q=8, k=40)
    mask = mask.at[:, :, 0, :].set(True)  # row 0 blocks everything
    out = fused_masked_attention(q, k, v, mask)  # cpu -> reference path
    unmasked = attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               np.asarray(unmasked[:, :, 0]), rtol=1e-4, atol=1e-5)


def test_no_mask_matches_plain_softmax():
    rng = np.random.RandomState(3)
    q, k, v, _ = _inputs(rng, q=16, k=64)
    out = fused_masked_attention(q, k, v, None)
    ref = attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_flow():
    rng = np.random.RandomState(4)
    q, k, v, mask = _inputs(rng, q=16, k=64)

    def loss(q, k, v):
        return jnp.sum(fused_masked_attention(q, k, v, mask) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0


@pytest.mark.slow  # compile-heavy: re-tiered for fast-gate margin (round 4)
def test_decoder_uses_fused_flag():
    """use_fused_attention=True must give identical outputs on CPU (fallback)
    and keep the same param structure as the dense path."""
    from partdistillation_tpu.models.transformer_decoder import (
        MultiScaleMaskedTransformerDecoder,
        TransformerDecoderConfig,
    )

    def build(flag):
        cfg = TransformerDecoderConfig(
            num_classes=1, hidden_dim=32, num_queries=8, num_heads=4,
            dim_feedforward=64, dec_layers=2, mask_dim=32,
            use_fused_attention=flag)
        return MultiScaleMaskedTransformerDecoder(cfg)

    rng = np.random.RandomState(5)
    feats = [jnp.asarray(rng.randn(1, s, s, 32).astype(np.float32))
             for s in (8, 16, 32)]
    mask_feat = jnp.asarray(rng.randn(1, 64, 64, 32).astype(np.float32))
    m1 = build(True)
    m2 = build(False)
    p = jax.jit(m1.init)(jax.random.PRNGKey(0), feats, mask_feat)
    o1 = m1.apply(p, feats, mask_feat)
    o2 = m2.apply(p, feats, mask_feat)  # same params fit both paths
    np.testing.assert_allclose(np.asarray(o1["pred_masks"]),
                               np.asarray(o2["pred_masks"]), rtol=1e-4, atol=1e-4)


def test_bwd_kernel_matches_autodiff_interpret():
    from partdistillation_tpu.ops.fused_attention import _fused_bwd_pallas

    rng = np.random.RandomState(7)
    q, k, v, mask = _inputs(rng, q=37, k=300)
    neg = _neg(mask)
    g = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
    _, vjp = jax.vjp(lambda a, b, c: attention_reference(a, b, c, neg), q, k, v)
    rq, rk, rv = vjp(g)
    dq, dk, dv = _fused_bwd_pallas(q, k, v, neg, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=1e-3, atol=1e-4)


def test_bwd_kernel_no_mask_interpret():
    from partdistillation_tpu.ops.fused_attention import _fused_bwd_pallas

    rng = np.random.RandomState(8)
    q, k, v, _ = _inputs(rng, q=128, k=256)
    g = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
    _, vjp = jax.vjp(lambda a, b, c: attention_reference(a, b, c, None), q, k, v)
    rq, rk, rv = vjp(g)
    dq, dk, dv = _fused_bwd_pallas(q, k, v, None, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=1e-3, atol=1e-4)


class TestFusedWindowAttention:
    """Periodic-bias windowed attention (the Swin path)."""

    def _inputs(self, b_img=2, nw=4, heads=3, n=16, d=8, seed=0):
        rng = np.random.RandomState(seed)
        bnw = b_img * nw
        q = jnp.asarray(rng.randn(bnw, heads, n, d).astype(np.float32))
        k = jnp.asarray(rng.randn(bnw, heads, n, d).astype(np.float32))
        v = jnp.asarray(rng.randn(bnw, heads, n, d).astype(np.float32))
        bias = jnp.asarray(rng.randn(nw, heads, n, n).astype(np.float32))
        return q, k, v, bias

    def test_periodic_kernel_matches_reference(self):
        from partdistillation_tpu.ops.fused_attention import (
            _fused_periodic_fwd_pallas, attention_reference)

        q, k, v, bias = self._inputs()
        qt, kt, vt = (jnp.swapaxes(a, 2, 3) for a in (q, k, v))
        out = _fused_periodic_fwd_pallas(qt, kt, vt, bias, 0.5, interpret=True)
        # group-major: each bias block covers B/P contiguous windows
        full = jnp.repeat(bias, q.shape[0] // bias.shape[0], axis=0)
        ref = attention_reference(q * 0.5, k, v, full)
        np.testing.assert_allclose(np.asarray(jnp.swapaxes(out, 2, 3)),
                                   np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_periodic_grads_match_reference(self):
        from partdistillation_tpu.ops.fused_attention import (
            _fused_periodic_bwd, attention_reference)

        q, k, v, bias = self._inputs(b_img=1, nw=2, heads=2, n=8, d=4)
        qt, kt, vt = (jnp.swapaxes(a, 2, 3) for a in (q, k, v))
        g = jnp.ones((q.shape[0], 2, 4, 8), jnp.float32)  # (B,H,D,N) cotangent
        dqt, dkt, dvt, dbias = _fused_periodic_bwd(0.5, (qt, kt, vt, bias), g)
        # finite-structure checks + bias-group reduction
        assert dqt.shape == qt.shape and dbias.shape == bias.shape
        _, vjp = jax.vjp(lambda b_: attention_reference(
            q * 0.5, k, v, jnp.repeat(b_, q.shape[0] // bias.shape[0], axis=0)), bias)
        (dbias_ref,) = vjp(jnp.swapaxes(g, 2, 3))
        np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
    def test_swin_fused_flag_equivalence(self):
        """SwinTransformer(fused_attention=True) == (False) on CPU, both with
        a shifted block in play."""
        from partdistillation_tpu.models.swin import SwinConfig, SwinTransformer

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        outs = []
        for fused in (True, False):
            cfg = SwinConfig(embed_dim=8, depths=(2, 2), num_heads=(2, 4),
                             window_size=4, drop_path_rate=0.0,
                             out_features=("res2", "res3"), fused_attention=fused)
            model = SwinTransformer(cfg)
            params = model.init(jax.random.PRNGKey(0), x)
            outs.append(model.apply(params, x))
        for key in outs[0]:
            np.testing.assert_allclose(np.asarray(outs[0][key]),
                                       np.asarray(outs[1][key]),
                                       atol=1e-5, rtol=1e-5)


def test_qkv_layout_bfn_equivalence():
    """SwinBlock qkv_layout='bfn' (relayout-free qkv feed, VERDICT r4 #2)
    equals the default 'fbn' path with an IDENTICAL param tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from partdistillation_tpu.models.swin import SwinBlock

    kw = dict(dim=16, num_heads=4, window_size=4, shift_size=2,
              mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop_path=0.0,
              dtype=jnp.float32, fused_attention=True, fused_layernorm=False,
              fused_mlp=False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16), jnp.float32)
    a = SwinBlock(**kw, qkv_layout="fbn")
    b = SwinBlock(**kw, qkv_layout="bfn")
    pa = a.init(jax.random.PRNGKey(0), x, True)
    pb = b.init(jax.random.PRNGKey(0), x, True)
    sa = jax.tree_util.tree_structure(pa)
    sb = jax.tree_util.tree_structure(pb)
    assert sa == sb, (sa, sb)
    shapes = jax.tree_util.tree_map(lambda u, v: u.shape == v.shape, pa, pb)
    assert all(jax.tree_util.tree_leaves(shapes))
    ya = a.apply(pa, x, True)
    yb = b.apply(pa, x, True)  # same params through both layouts
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               atol=1e-5, rtol=1e-5)

class TestFusedWindowAttentionProj:
    """Attention + output-projection single-program kernel (VERDICT r4 #7)."""

    def _inputs(self, b_img=2, nw=4, heads=3, n=16, d=8, c_out=None, seed=0):
        rng = np.random.RandomState(seed)
        bnw = b_img * nw
        c = heads * d
        c_out = c_out or c
        qt = jnp.asarray(rng.randn(bnw, heads, d, n).astype(np.float32))
        kt = jnp.asarray(rng.randn(bnw, heads, d, n).astype(np.float32))
        vt = jnp.asarray(rng.randn(bnw, heads, d, n).astype(np.float32))
        bias = jnp.asarray(rng.randn(nw, heads, n, n).astype(np.float32))
        w = jnp.asarray(rng.randn(c, c_out).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.randn(c_out).astype(np.float32))
        return qt, kt, vt, bias, w, b

    def test_kernel_matches_reference_interpret(self):
        from partdistillation_tpu.ops.fused_attention import (
            _attn_proj_fwd_pallas, window_attention_proj_reference)

        qt, kt, vt, bias, w, b = self._inputs()
        out = _attn_proj_fwd_pallas(qt, kt, vt, bias, w, b, 0.5,
                                    interpret=True)
        ref = window_attention_proj_reference(qt, kt, vt, bias, w, b, 0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_grads_match_composition(self):
        from partdistillation_tpu.ops.fused_attention import (
            _fused_attn_proj_bwd, window_attention_proj_reference)

        qt, kt, vt, bias, w, b = self._inputs(b_img=1, nw=2, heads=2, n=8, d=8)
        g = jnp.ones((qt.shape[0], 8, w.shape[1]), jnp.float32)
        grads = _fused_attn_proj_bwd(0.5, (qt, kt, vt, bias, w, b), g)
        assert grads[0].shape == qt.shape and grads[3].shape == bias.shape
        assert grads[4].shape == w.shape and grads[5].shape == b.shape
        _, vjp = jax.vjp(lambda ww: window_attention_proj_reference(
            qt, kt, vt, bias, ww, b, 0.5), w)
        (dw_ref,) = vjp(g)
        np.testing.assert_allclose(np.asarray(grads[4]), np.asarray(dw_ref),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.slow  # compile-heavy: full-model equivalence
    def test_swin_fused_proj_equivalence(self):
        """SwinTransformer(fused_proj=True) == (False) on CPU (the reference
        composition path), both fused-attention."""
        from partdistillation_tpu.models.swin import SwinConfig, SwinTransformer

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        outs = []
        params = None
        for fproj in (True, False):
            cfg = SwinConfig(embed_dim=8, depths=(2, 2), num_heads=(2, 4),
                             window_size=4, drop_path_rate=0.0,
                             out_features=("res2", "res3"), fused_proj=fproj)
            model = SwinTransformer(cfg)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), x)
            outs.append(model.apply(params, x))
        for key in outs[0]:
            np.testing.assert_allclose(np.asarray(outs[0][key]),
                                       np.asarray(outs[1][key]),
                                       atol=1e-5, rtol=1e-5)
