"""Fused masked cross-attention (Pallas/TPU).

The Mask2Former decoder cross-attends Q=200 queries against one feature scale
at a time (K up to H*W/64 = ~6.4k keys at 640^2) through 9 layers, with a
per-query boolean attention mask derived from the previous layer's mask
prediction (reference mask2former_transformer_decoder.py:403-425). In the
plain XLA composition the (B, heads, Q, K) logits and probabilities round-trip
through HBM; this kernel fuses QK^T -> mask -> softmax -> PV into one
VMEM-resident pass per (batch, head, query-tile). Measured on one TPU chip at
production shapes (B8 H8 Q200 K6400 D32, bf16): 2.9 ms fused vs 25.6 ms for
the XLA composition.

Design notes
------------
* K/V are passed TRANSPOSED, (B, H, D, K): with head_dim = 32 the natural
  (K, D) layout puts D on the 128-lane axis and Mosaic pads every K-sized
  VMEM buffer 4x -- enough to blow the 16 MB VMEM budget in the backward
  (observed 18.7 MB scoped allocation). In (D, K) layout all large buffers
  are lane-aligned; the XLA-side transposes fuse into neighbors.
* The additive mask is stored bf16 (values are only 0 / -1e9): halves HBM
  traffic and VMEM footprint; added in f32.
* K and V for one (b, h) fit VMEM at production sizes, so no online-softmax
  streaming -- a single-pass kernel per query tile is the right point on TPU.
* The Mask2Former "all-blocked row -> unblock" fix-up
  (mask2former_transformer_decoder.py:421) is applied in the wrapper, fused
  by XLA; padded keys stay blocked.
* Backward is a second Pallas kernel (recompute-P): dK/dV accumulate across
  sequential q-tile grid steps into transposed output blocks.
* Why not a Pallas ms_deform_attn instead: Mosaic's gather lowering only
  supports full-shape take_along_axis (indices.shape == input.shape + (1,)),
  so the deformable op's per-query bilinear gathers cannot be expressed
  directly; the XLA gather composition (ops/ms_deform_attn.py) is already
  near-optimal there, and this kernel attacks the decoder instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["fused_masked_attention", "fused_window_attention",
           "fused_window_attention_proj", "attention_reference",
           "attention_reference_t", "window_attention_proj_reference"]

_LANE = 128


def attention_reference(q, k, v, neg_mask):
    """XLA composition: q,k,v (B,H,Q|K,D); neg_mask (B,1|H,Q,K) additive f32."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if neg_mask is not None:
        logits = logits + neg_mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _softmax_p(q, kt, m):
    """(Qt,D) x (D,K) + bf16 mask -> row-softmax probabilities, f32."""
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + m.astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, kt_ref, vt_ref, m_ref, out_ref):
    p = _softmax_p(q_ref[0, 0], kt_ref[0, 0], m_ref[0, 0])
    # out = P V: contract K of p (Qt,K) with K of vT (D,K) -> (Qt, D)
    out_ref[0, 0] = jax.lax.dot_general(
        p.astype(vt_ref.dtype), vt_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(q_ref, kt_ref, vt_ref, m_ref, g_ref,
                dq_ref, dkt_ref, dvt_ref):
    """Recompute-P backward, one program per (b, h, q-tile); all MXU.

      P    = softmax(QK^T + M)
      dV^T += G^T P      ; dP = G V^T
      dS   = P * (dP - rowsum(P * dP))
      dQ   = dS K        ; dK^T += Q^T dS

    dK^T/dV^T revisit the same output block across sequential q-tile grid
    steps (TPU grids execute in order), initialized at the first tile.
    """
    from jax.experimental import pallas as pl

    qi = pl.program_id(2)
    q = q_ref[0, 0]    # (Qt, D)
    kt = kt_ref[0, 0]  # (D, K)
    vt = vt_ref[0, 0]  # (D, K)
    g = g_ref[0, 0]    # (Qt, D)

    p = _softmax_p(q, kt, m_ref[0, 0])  # (Qt, K) f32

    # dV^T (D, K) = G^T (D, Qt) @ P (Qt, K)
    dvt_tile = jax.lax.dot_general(
        g, p.astype(g.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dP (Qt, K) = G (Qt, D) @ V^T (D, K)
    dp = jax.lax.dot_general(g, vt, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(q.dtype)
    # dQ (Qt, D) = dS (Qt, K) @ K (K, D)  [kt is (D, K): contract K dims]
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, kt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    # dK^T (D, K) = Q^T (D, Qt) @ dS (Qt, K)
    dkt_tile = jax.lax.dot_general(q, ds, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(qi == 0)
    def _():
        dkt_ref[0, 0] = dkt_tile.astype(dkt_ref.dtype)
        dvt_ref[0, 0] = dvt_tile.astype(dvt_ref.dtype)

    @pl.when(qi > 0)
    def _():
        dkt_ref[0, 0] = (dkt_ref[0, 0].astype(jnp.float32)
                         + dkt_tile).astype(dkt_ref.dtype)
        dvt_ref[0, 0] = (dvt_ref[0, 0].astype(jnp.float32)
                         + dvt_tile).astype(dvt_ref.dtype)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _prep(q, k, v, neg_mask, q_tile):
    """Pad to tiles, transpose K/V to (B,H,D,K), mask to bf16."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    qp = _pad_to(q, 2, q_tile)
    kt = _pad_to(jnp.swapaxes(k, 2, 3), 3, _LANE)   # (B,H,D,Kp)
    vt = _pad_to(jnp.swapaxes(v, 2, 3), 3, _LANE)
    if neg_mask is None:
        neg_mask = jnp.zeros((b, 1, nq, nk), jnp.float32)
    # bf16 storage (values only 0 / -1e9); padded keys blocked, padded query
    # rows unblocked-over-real-keys (harmless: their outputs/grads are cut).
    mp = _pad_to(_pad_to(neg_mask.astype(jnp.bfloat16), 3, _LANE, -1e9),
                 2, q_tile, 0.0)
    return qp, kt, vt, mp


def _mask_spec(pl, pltpu, mh, q_tile, nkp):
    if mh > 1:
        return pl.BlockSpec((1, 1, q_tile, nkp),
                            lambda bi, hi, qi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, 1, q_tile, nkp),
                        lambda bi, hi, qi: (bi, 0, qi, 0),
                        memory_space=pltpu.VMEM)


def _fused_fwd_pallas(q, k, v, neg_mask, q_tile: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, d = q.shape
    mh = 1 if neg_mask is None else neg_mask.shape[1]
    qp, kt, vt, mp = _prep(q, k, v, neg_mask, q_tile)
    nqp, nkp = qp.shape[2], kt.shape[3]

    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, d), q.dtype),
        grid=(b, h, nqp // q_tile),
        in_specs=[
            pl.BlockSpec((1, 1, q_tile, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, nkp), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, nkp), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            _mask_spec(pl, pltpu, mh, q_tile, nkp),
        ],
        out_specs=pl.BlockSpec((1, 1, q_tile, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kt, vt, mp)
    return out[:, :, :nq]


def _fused_bwd_pallas(q, k, v, neg_mask, g, q_tile: int = 128,
                      interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, d = q.shape
    nk = k.shape[2]
    mh = 1 if neg_mask is None else neg_mask.shape[1]
    qp, kt, vt, mp = _prep(q, k, v, neg_mask, q_tile)
    gp = _pad_to(g, 2, q_tile)
    nqp, nkp = qp.shape[2], kt.shape[3]

    spec_q = pl.BlockSpec((1, 1, q_tile, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, 1, d, nkp), lambda bi, hi, qi: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dkt, dvt = pl.pallas_call(
        _bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((b, h, nqp, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, d, nkp), k.dtype),
                   jax.ShapeDtypeStruct((b, h, d, nkp), v.dtype)),
        grid=(b, h, nqp // q_tile),
        in_specs=[spec_q, spec_kv, spec_kv,
                  _mask_spec(pl, pltpu, mh, q_tile, nkp), spec_q],
        out_specs=(spec_q, spec_kv, spec_kv),
        interpret=interpret,
    )(qp, kt, vt, mp, gp)
    return (dq[:, :, :nq],
            jnp.swapaxes(dkt, 2, 3)[:, :, :nk],
            jnp.swapaxes(dvt, 2, 3)[:, :, :nk])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(q, k, v, neg_mask, q_tile):
    return _fused_fwd_pallas(q, k, v, neg_mask, q_tile)


def _fused_fwd(q, k, v, neg_mask, q_tile):
    return _fused_fwd_pallas(q, k, v, neg_mask, q_tile), (q, k, v, neg_mask)


def _fused_bwd(q_tile, res, g):
    q, k, v, neg_mask = res
    dq, dk, dv = _fused_bwd_pallas(q, k, v, neg_mask, g, q_tile)
    return dq, dk, dv, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def attention_reference_t(qt, kt, vt, neg_mask, scale=1.0):
    """XLA composition in the TRANSPOSED domain: qt/kt/vt (B,H,D,N),
    neg_mask (B,1|H,Nq,Nk) additive; returns (B,H,D,Nq)."""
    logits = jnp.einsum("bhdq,bhdk->bhqk", qt * jnp.asarray(scale, qt.dtype),
                        kt, preferred_element_type=jnp.float32)
    if neg_mask is not None:
        logits = logits + neg_mask
    probs = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
    return jnp.einsum("bhqk,bhdk->bhdq", probs, vt)


def _fwd_kernel_allheads_t(q_ref, k_ref, v_ref, m_ref, out_ref, *,
                           windows: int, heads: int, scale: float):
    """One program per (window group-chunk): WPB same-bias windows x hc heads
    unrolled (a per-(window, head) grid is dispatch-bound at ~0.7 us/program,
    profiled; batching windows also amortizes the per-program prologue and
    keeps the MXU pipeline fed between tiny K=D dots). Operands arrive in the
    TRANSPOSED (D, N) feature-major layout that the qkv projection emits
    directly (models/swin.py TransposedDense): the logits dot contracts the
    sublane D axis of both operands — the MXU's native systolic form — and no
    HLO-level relayout of the (B,N,3HD) qkv tensor is ever needed (the
    token-major form costs ~12 ms/step in 32-lane-minor transpose copies at
    Swin res2, profiled). The 1/sqrt(d) q-scale is folded in."""
    for wi in range(windows):
        for hh in range(heads):
            qt = q_ref[wi, hh] * q_ref.dtype.type(scale)     # (D, Nq)
            s = jax.lax.dot_general(qt, k_ref[wi, hh], (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + m_ref[0, hh].astype(jnp.float32)         # (Nq, Nk)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            out_ref[wi, hh] = jax.lax.dot_general(
                v_ref[wi, hh], p.astype(v_ref.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _fused_periodic_fwd_pallas(qt, kt, vt, bias, scale, interpret: bool = False):
    """Forward with a GROUPED additive bias: bias (P, H, Nq, Nk); the window
    batch is P contiguous groups of G = B/P windows sharing one bias block
    (Swin window-major order: the rel-pos bias is shared by all windows, the
    shift mask by all images' same-position windows). Avoids materializing a
    (B, H, N, N) mask for thousands of windows. qt/kt/vt: (B, H, D, N).

    The grid is (heads, P, G/WPB) with WPB windows per program: the bias
    block index is constant along the innermost dim, so Pallas's block-delta
    tracking fetches each (hc, N, K) f32 bias once per group (re-fetching it
    per window costs ~2.8 GB/step at Swin res2, profiled)."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, d, nq = qt.shape
    nk = kt.shape[3]
    per = bias.shape[0]
    assert b % per == 0, (b, per)
    g = b // per
    assert nq % 8 == 0 and nk % 8 == 0 and d % 8 == 0, (nq, nk, d)
    bp = bias.astype(jnp.float32)

    # (windows/program, heads/program) under the ~16 MB VMEM budget
    # (q + k + v + out bf16 lane-padded to 128-multiples, bias + scratch f32)
    lq, lk = -(-nq // _LANE) * _LANE, -(-nk // _LANE) * _LANE
    per_hw = (2 * d * lq * 2 + 2 * d * lk * 2 + 2 * lq * lk * 4)
    budget = 10 * 2**20
    wpb = min(g, 8)
    while wpb > 1 and (g % wpb or wpb * per_hw > budget):
        wpb -= 1
    hc = h
    while hc > 1 and (h % hc or wpb * hc * per_hw > budget):
        hc -= 1

    return pl.pallas_call(
        ft.partial(_fwd_kernel_allheads_t, windows=wpb, heads=hc, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, d, nq), qt.dtype),
        grid=(h // hc, per, g // wpb),
        in_specs=[
            pl.BlockSpec((wpb, hc, d, nq),
                         lambda hi, pi, bj: (pi * (g // wpb) + bj, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpb, hc, d, nk),
                         lambda hi, pi, bj: (pi * (g // wpb) + bj, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpb, hc, d, nk),
                         lambda hi, pi, bj: (pi * (g // wpb) + bj, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, nq, nk),
                         lambda hi, pi, bj: (pi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpb, hc, d, nq),
                               lambda hi, pi, bj: (pi * (g // wpb) + bj, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qt, kt, vt, bp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_periodic(qt, kt, vt, bias, scale):
    return _fused_periodic_fwd_pallas(qt, kt, vt, bias, scale)


def _fused_periodic_fwd(qt, kt, vt, bias, scale):
    return (_fused_periodic_fwd_pallas(qt, kt, vt, bias, scale),
            (qt, kt, vt, bias))


def _fused_periodic_bwd(scale, res, g):
    qt, kt, vt, bias = res
    b = qt.shape[0]
    # expand the grouped bias (group-major: each bias block covers B/P
    # contiguous windows); the XLA-composition VJP gives exact grads
    # (incl. d/d bias, reduced back over the group by the broadcast transpose)
    reps = b // bias.shape[0]
    full = jnp.repeat(bias, reps, axis=0)
    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb: attention_reference_t(qq, kk, vv, bb, scale),
        qt, kt, vt, full)
    dqt, dkt, dvt, dfull = vjp(g)
    dbias = dfull.reshape((bias.shape[0], reps) + bias.shape[1:]).sum(1)
    return dqt, dkt, dvt, dbias


_fused_periodic.defvjp(_fused_periodic_fwd, _fused_periodic_bwd)


def window_attention_proj_reference(qt, kt, vt, bias, w, b, scale):
    """XLA composition of attention + output projection: qt/kt/vt (B,H,D,N),
    GROUPED bias (P,H,Nq,Nk), proj kernel w (H*D, C) + bias b (C,) ->
    (B, Nq, C) token-major."""
    bb = qt.shape[0]
    full = bias if bias.shape[0] in (1, bb) else jnp.repeat(
        bias, bb // bias.shape[0], axis=0)
    out = attention_reference_t(qt, kt, vt, full, scale)  # (B, H, D, Nq)
    h, d = out.shape[1], out.shape[2]
    out = out.reshape(bb, h * d, out.shape[3])
    y = jnp.einsum("bfn,fc->bnc", out, w.astype(out.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _fwd_kernel_attn_proj(q_ref, k_ref, v_ref, m_ref, w_ref, b_ref, out_ref, *,
                          windows: int, heads: int, head_dim: int,
                          scale: float):
    """Window attention + output projection in ONE program (VERDICT r4 #7:
    the attention output never round-trips HBM between the window kernel and
    the proj matmul). One program per window group; ALL heads resident. The
    proj is accumulated per head — out(n, c) = sum_h attnT_h(n, d) @ w_h(d, c)
    — three MXU dots per (window, head), zero in-kernel transposes (both
    proj operands contract their sublane axis)."""
    for wi in range(windows):
        acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                               (out_ref.shape[1], out_ref.shape[2]))
        for hh in range(heads):
            qt = q_ref[wi, hh] * q_ref.dtype.type(scale)     # (D, Nq)
            s = jax.lax.dot_general(qt, k_ref[wi, hh], (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + m_ref[0, hh].astype(jnp.float32)         # (Nq, Nk)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            attn = jax.lax.dot_general(                       # (D, Nq)
                v_ref[wi, hh], p.astype(v_ref.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(v_ref.dtype)
            acc = acc + jax.lax.dot_general(                  # (Nq, C)
                attn, w_ref[hh * head_dim:(hh + 1) * head_dim, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[wi] = acc.astype(out_ref.dtype)


def _attn_proj_fwd_pallas(qt, kt, vt, bias, w, b, scale,
                          interpret: bool = False):
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb, h, d, nq = qt.shape
    nk = kt.shape[3]
    c = w.shape[1]
    per = bias.shape[0]
    assert bb % per == 0, (bb, per)
    g = bb // per
    bp = bias.astype(jnp.float32)
    brow = jnp.zeros((1, c), w.dtype) if b is None else b.reshape(1, c)

    # VMEM: all heads of wpb windows (q/k/v), all-head bias, proj weight,
    # f32 accumulator + out tile
    lq, lk = -(-nq // _LANE) * _LANE, -(-nk // _LANE) * _LANE
    lc = -(-c // _LANE) * _LANE
    fixed = (h * lq * lk * 4            # bias (f32)
             + h * d * lc * w.dtype.itemsize   # proj weight
             + 2 * lq * lk * 4          # logits/probs scratch
             + lq * lc * 4)             # f32 accumulator
    per_w = (h * d * (lq + 2 * lk) * qt.dtype.itemsize   # q + k + v
             + lq * lc * qt.dtype.itemsize)              # out tile
    budget = 12 * 2**20
    wpb = min(g, 8)
    while wpb > 1 and (g % wpb or fixed + wpb * per_w > budget):
        wpb -= 1
    if fixed + wpb * per_w > budget:
        return None  # caller falls back to the two-step path

    return pl.pallas_call(
        ft.partial(_fwd_kernel_attn_proj, windows=wpb, heads=h, head_dim=d,
                   scale=scale),
        out_shape=jax.ShapeDtypeStruct((bb, nq, c), qt.dtype),
        grid=(per, g // wpb),
        in_specs=[
            pl.BlockSpec((wpb, h, d, nq),
                         lambda pi, bj: (pi * (g // wpb) + bj, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpb, h, d, nk),
                         lambda pi, bj: (pi * (g // wpb) + bj, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpb, h, d, nk),
                         lambda pi, bj: (pi * (g // wpb) + bj, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, nq, nk), lambda pi, bj: (pi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h * d, c), lambda pi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda pi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpb, nq, c),
                               lambda pi, bj: (pi * (g // wpb) + bj, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qt, kt, vt, bp, w, brow)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_attn_proj(qt, kt, vt, bias, w, b, scale):
    out = _attn_proj_fwd_pallas(qt, kt, vt, bias, w, b, scale)
    assert out is not None
    return out


def _fused_attn_proj_fwd(qt, kt, vt, bias, w, b, scale):
    return _fused_attn_proj(qt, kt, vt, bias, w, b, scale), \
        (qt, kt, vt, bias, w, b)


def _fused_attn_proj_bwd(scale, res, g):
    # XLA-composition VJP (recompute); grouped bias reduced over its group.
    # Never taken for the frozen trunk; exact for unfrozen fine-tuning.
    qt, kt, vt, bias, w, b = res
    reps = qt.shape[0] // bias.shape[0]
    full = jnp.repeat(bias, reps, axis=0)
    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb, ww, bias_: window_attention_proj_reference(
            qq, kk, vv, bb, ww, bias_, scale),
        qt, kt, vt, full, w, b)
    dqt, dkt, dvt, dfull, dw, db = vjp(g)
    dbias = dfull.reshape((bias.shape[0], reps) + bias.shape[1:]).sum(1)
    return dqt, dkt, dvt, dbias, dw, db


_fused_attn_proj.defvjp(_fused_attn_proj_fwd, _fused_attn_proj_bwd)


def fused_window_attention_proj(
    qt: jnp.ndarray,
    kt: jnp.ndarray,
    vt: jnp.ndarray,
    bias: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    scale: float = 1.0,
) -> Optional[jnp.ndarray]:
    """Windowed attention + output projection fused into one Pallas program:
    qt/kt/vt (B, H, D, N) feature-major, GROUPED additive bias (P, H, Nq, Nk),
    proj kernel (H*D, C) + bias (C,) -> (B, Nq, C) token-major.

    Returns None when the all-heads-resident program exceeds the VMEM budget
    (Swin-L res5) or shapes need sublane padding — the caller then takes the
    two-step fused_window_attention + XLA-proj path.
    """
    if jax.default_backend() != "tpu":
        return window_attention_proj_reference(qt, kt, vt, bias, w, b, scale)
    nq, d = qt.shape[3], qt.shape[2]
    if nq % 8 or kt.shape[3] % 8 or d % 8:
        return None
    if not _attn_proj_fits(qt, kt, w):
        return None
    return _fused_attn_proj(qt, kt, vt, bias, w, b, scale)


def _attn_proj_fits(qt, kt, w) -> bool:
    bb, h, d, nq = qt.shape
    nk = kt.shape[3]
    c = w.shape[1]
    lq, lk = -(-nq // _LANE) * _LANE, -(-nk // _LANE) * _LANE
    lc = -(-c // _LANE) * _LANE
    fixed = (h * lq * lk * 4 + h * d * lc * w.dtype.itemsize
             + 2 * lq * lk * 4 + lq * lc * 4)
    per_w = (h * d * (lq + 2 * lk) * qt.dtype.itemsize
             + lq * lc * qt.dtype.itemsize)
    return fixed + per_w <= 12 * 2**20


def fused_window_attention(
    qt: jnp.ndarray,
    kt: jnp.ndarray,
    vt: jnp.ndarray,
    bias: jnp.ndarray,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Windowed attention in the TRANSPOSED domain: qt/kt/vt (B, H, D, N),
    returns (B, H, D, N); GROUPED additive bias (P, H, N, N) with B % P == 0 —
    the batch is P contiguous groups of B/P windows, window bi uses
    bias[bi // (B/P)] (Swin window-major partition order).

    q is UNSCALED; the 1/sqrt(d) ``scale`` is folded into the kernel. The
    feature-major layout is what a transposed-output qkv projection emits
    directly (models/swin.py TransposedDense), so no relayout copies surround
    the kernel, and the f32 (B, H, N, N) logits of thousands of windows never
    round-trip through HBM.
    """
    if jax.default_backend() != "tpu":
        b = qt.shape[0]
        if bias.shape[0] == 1:
            full = bias
        else:
            full = jnp.repeat(bias, b // bias.shape[0], axis=0)
        return attention_reference_t(qt, kt, vt, full, scale)
    nq = qt.shape[3]
    if nq % 8 or qt.shape[2] % 8:
        # generic window sizes: pad tokens to sublane multiples, head_dim too;
        # padded keys are blocked via the bias, padded queries sliced off
        qp = _pad_to(_pad_to(qt, 3, 8), 2, 8)
        kp = _pad_to(_pad_to(kt, 3, 8), 2, 8)
        vp = _pad_to(_pad_to(vt, 3, 8), 2, 8)
        bp = _pad_to(_pad_to(bias.astype(jnp.float32), 3, 8, -1e9), 2, 8)
        out = _fused_periodic(qp, kp, vp, bp, scale)
        return out[:, :, : qt.shape[2], :nq]
    return _fused_periodic(qt, kt, vt, bias.astype(jnp.float32), scale)


def fused_masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_mask: Optional[jnp.ndarray] = None,
    q_tile: int = 128,
) -> jnp.ndarray:
    """Masked attention over (B, H, Q, D) x (B, H, K, D) -> (B, H, Q, D).

    q must be pre-scaled (the kernel applies no 1/sqrt(d)).
    block_mask: optional (B, 1|H, Q, K) bool, True = pair may NOT attend.
    Rows whose real keys are ALL blocked are unblocked (Mask2Former fix-up).

    Uses the Pallas kernels on TPU; falls back to the XLA composition
    elsewhere (CPU tests; interpret mode covers the kernels in CI).
    """
    if block_mask is not None:
        all_blocked = jnp.all(block_mask, axis=-1, keepdims=True)
        effective = block_mask & ~all_blocked
        neg_mask = jnp.where(effective, jnp.float32(-1e9), jnp.float32(0.0))
    else:
        neg_mask = None

    if jax.default_backend() != "tpu":
        return attention_reference(q, k, v, neg_mask)
    return _fused(q, k, v, neg_mask, q_tile)
