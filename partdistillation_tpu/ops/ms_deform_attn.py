"""Multi-scale deformable attention sampling core (TPU/XLA-native).

Functional equivalent of the reference's CUDA im2col kernel
(ops/src/cuda/ms_deform_im2col_cuda.cuh:243, dispatched from
ms_deform_attn_cuda.cu) and of its pure-PyTorch specification
(ops/functions/ms_deform_attn_func.py:55-75): for every (query, head, level,
point) the op bilinearly samples the per-head value image at a predicted
fractional location and accumulates with a softmax attention weight.

TPU design notes
----------------
* Two numerically-identical formulations, selected by `mode`:
  - "onehot_mxu" (TPU default): per level, bilinear sampling is applied as a
    sparse (taps, S_l) matrix-matmul on the MXU, with the 4-nonzeros-per-row
    one-hot LHS built on the fly and fused by XLA. Chosen because XLA's
    arbitrary-index gather on TPU is SMEM-index-staging bound (~5 GB/s
    useful, profiled ~100x off HBM speed-of-light at the production
    geometry), and Mosaic/Pallas has no large-table vector gather to hand-
    write a better one (its gather lowering only supports full-shape
    take_along_axis, and crashes on 6400-row tables).
  - "take" (CPU/GPU default): four flat `jnp.take` corner gathers per level
    in a CHANNELS-FIRST (B*M, D, Lq*P) layout — head_dim D = 32 must not sit
    on the minor (128-lane) axis of the big gather temporaries, or they pad
    4x (measured 1.03 GB per tap temp at B8, Lq8400, P4, D32).
* Attention weights are folded into the bilinear corner weights (cast to the
  value dtype — no silent f32 promotion of bf16 activations).
* The backward pass is the autodiff transpose (matmul transposes in
  onehot_mxu mode) — no hand-written col2im kernels (the reference needed
  six CUDA variants, ms_deform_im2col_cuda.cuh:307-851).
* `spatial_shapes` is a static Python tuple: under jit the level geometry is
  a compile-time constant (images are padded to fixed sizes), so there is no
  level_start_index bookkeeping tensor.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ms_deform_attn", "msda_band_oob_fraction"]


def _corner_taps(x, y, h, w, wl, dtype):
    """The four bilinear corner (flat_index, weight) pairs for pixel coords
    (x, y) on an (h, w) grid with zero padding; weights folded with `wl`."""
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    x0, y0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32)
    wx1 = (x - x0f).astype(dtype)
    wy1 = (y - y0f).astype(dtype)
    wx0 = (1.0 - (x - x0f)).astype(dtype)
    wy0 = (1.0 - (y - y0f)).astype(dtype)
    taps = []
    for yi, xi, wgt in ((y0, x0, wy0 * wx0), (y0, x0 + 1, wy0 * wx1),
                        (y0 + 1, x0, wy1 * wx0), (y0 + 1, x0 + 1, wy1 * wx1)):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        taps.append((idx, wgt * valid.astype(dtype) * wl))
    return taps


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    mode: Optional[str] = None,
    band_radius: int = 6,
    band_tile_queries: int = 512,
    band_tile_x: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-scale deformable attention sampling.

    Args:
      value: (B, S, M, D) — flattened concatenation of L level feature maps,
        S = sum_l H_l * W_l, M heads, D channels per head.
      spatial_shapes: static sequence of (H_l, W_l) Python ints.
      sampling_locations: (B, Lq, M, L, P, 2), normalized to [0, 1] over each
        level's extent, last dim ordered (x, y).
      attention_weights: (B, Lq, M, L, P), softmax-normalized over (L, P).
      mode: "onehot_mxu" | "take" | "banded" | "pallas_folded" | None
        (auto: onehot_mxu on TPU). All modes share identical corner weights;
        they differ only in how the sparse sampling matrix is applied.
        "banded" additionally requires Lq == S (encoder self-attention,
        queries = pixels in level-major row-major order) and is exact only
        while every tap stays within `band_radius` rows of its query's
        reference row (see _ms_deform_attn_banded; measure with
        msda_band_oob_fraction).
      band_radius: vertical tap radius, in SAMPLING-level pixels, that
        "banded" mode guarantees to cover (offsets are predicted in per-level
        pixel units, attention.py:_sampling_offset_bias_init caps the init at
        n_points pixels).
      band_tile_queries: query-tile size cap for "banded". Never affects
        exactness, only speed. Larger tiles amortize the 2*radius+2 band
        overhead over more query rows but grow the fused-dot LHS tile past
        the VMEM budget: measured 512 -> 26.35 img/s vs 2048 -> 22.96 on the
        stage-3 bench (PERF.md round 3), so 512 stays the default.
      band_tile_x: if set, "banded" blocks queries in 2-D (band_tile_x caps
        BOTH the query-row and query-column tile edge) so each tile
        contracts against a (band_rows x band_cols) BLOCK of the sampling
        level instead of full-width rows — the hat build shrinks another
        ~1.9x at the 640^2 geometry (radius 4, tile 16). Exactness contract
        is the same as 1-D banding, applied per axis: taps must stay within
        `band_radius` sampling-level pixels of the reference point in x AND
        y (measure with msda_band_oob_fraction(..., tile_x=...)). None
        (default) keeps the 1-D row-band formulation.

    Returns:
      (B, Lq, M * D).
    """
    if mode is None:
        import os

        # PD_MSDA_MODE overrides the backend default (bench/profiling A/B)
        mode = os.environ.get(
            "PD_MSDA_MODE",
            "onehot_mxu" if jax.default_backend() == "tpu" else "take")
    if mode == "onehot_mxu":
        return _ms_deform_attn_onehot(
            value, spatial_shapes, sampling_locations, attention_weights)
    if mode == "banded":
        return _ms_deform_attn_banded(
            value, spatial_shapes, sampling_locations, attention_weights,
            band_radius, band_tile_queries, band_tile_x)
    if mode == "pallas_folded":
        return _ms_deform_attn_pallas_folded(
            value, spatial_shapes, sampling_locations, attention_weights)
    if mode != "take":
        raise ValueError(f"unknown ms_deform_attn mode {mode!r} "
                         "(onehot_mxu | take | banded | pallas_folded)")
    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    assert num_levels == len(spatial_shapes)
    assert s == sum(h * w for h, w in spatial_shapes), (
        f"value length {s} != sum of level sizes {spatial_shapes}"
    )
    dtype = value.dtype

    # (B, S, M, D) -> (B*M, D, S): channels-first, queries on the lane axis.
    val_cf = value.transpose(0, 2, 3, 1).reshape(b * m, d, s)
    # (B, Lq, M, L, P, *) -> (B*M, L, Lq*P, *)
    loc = sampling_locations.transpose(0, 2, 3, 1, 4, 5).reshape(
        b * m, num_levels, lq * p, 2)
    attw = attention_weights.transpose(0, 2, 3, 1, 4).reshape(
        b * m, num_levels, lq * p).astype(dtype)

    def sample_level(vl, xy, wl):
        """vl (D, HW) one level; xy (N, 2) pixel coords; wl (N,) attn weight.
        Returns (D, N) weighted samples; out-of-range corner taps read zero."""
        h, w = sample_level.hw
        out = jnp.zeros((vl.shape[0], xy.shape[0]), dtype)
        for idx, wgt in _corner_taps(xy[..., 0], xy[..., 1], h, w, wl, dtype):
            taps = jnp.take(vl, idx, axis=1)  # (D, N)
            out = out + taps * wgt[None, :]
        return out

    out = jnp.zeros((b * m, d, lq), dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        vl = val_cf[:, :, start : start + h * w]
        # normalized [0,1] -> pixel coords (align_corners=False)
        xy = loc[:, lvl] * jnp.asarray([w, h], jnp.float32) - 0.5
        sample_level.hw = (h, w)
        sampled = jax.vmap(sample_level)(vl, xy, attw[:, lvl])  # (BM, D, Lq*P)
        out = out + jnp.sum(sampled.reshape(b * m, d, lq, p), axis=-1)
        start += h * w

    # (B*M, D, Lq) -> (B, Lq, M*D)
    return out.reshape(b, m, d, lq).transpose(0, 3, 1, 2).reshape(b, lq, m * d)


def _ms_deform_attn_onehot(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """MXU formulation: per level, the bilinear sampling operator is a sparse
    (taps, S_l) matrix with four weighted non-zeros per row; applying it is a
    matmul against the level's (S_l, D) values.

    TPU rationale: XLA's arbitrary-index gather runs ~100x off HBM
    speed-of-light on TPU (index staging through SMEM serializes it; profiled
    at ~5 GB/s useful), while the one-hot build fuses into the matmul's LHS
    and the contraction rides the MXU — measured 3.8x faster per encoder
    layer at the production geometry. Numerics are identical to the take
    path (same corner weights; f32 accumulation via preferred_element_type).
    The gradient is exact bilinear-sampling autodiff: corner indices are
    piecewise-constant (one_hot of ints), gradients flow through the corner
    weights and the values — the same structure the reference's col2im CUDA
    backward hand-implements (ms_deform_im2col_cuda.cuh:307-851).
    """
    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    dtype = value.dtype

    # (B, S, M, D) -> (B, M, S, D): the dot's batch layout
    val = value.transpose(0, 2, 1, 3)
    # coordinates to (B, M, Lq, P, L, 2) batch-major — transposing the SMALL
    # coordinate tensors (4 MB) replaces the old (BM, L, Lq*P, 2) repacking
    # whose T(2,128)-padded copies cost ~10 ms/encoder-layer at 640^2 bs16
    loc = sampling_locations.transpose(0, 2, 1, 4, 3, 5)  # (B, M, Lq, P, L, 2)
    attw = attention_weights.transpose(0, 2, 1, 4, 3).astype(jnp.float32)
    # (B, M, Lq, P, L)

    out = jnp.zeros((b, m, lq, d), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        hw = h * w
        vl = val[:, :, start : start + hw]  # (B, M, HW, D)
        x = loc[..., lvl, 0] * w - 0.5  # (B, M, Lq, P), align_corners=False
        y = loc[..., lvl, 1] * h - 0.5
        aw = attw[..., lvl]  # (B, M, Lq, P)
        # The sampling matrix is a product of two hat functions over the flat
        # pixel grid: W[n, s] = relu(1-|sx - x_n|) * relu(1-|sy - y_n|) —
        # exactly the 4-corner bilinear one-hot sum (zero padding included:
        # out-of-range neighbors have no grid column). The P point taps are
        # FOLDED into one row per query as an unrolled elementwise sum with
        # the attention weights: every term is elementwise, so XLA fuses the
        # whole build into the dot's LHS (no (.., P, HW) or post-dot
        # (.., P, D) intermediate ever materializes) and the contraction
        # itself shrinks P-fold.
        # The 2-D hat is SEPARABLE: build thin (Lq, w) / (Lq, h) per-axis
        # hats and combine as a broadcast outer product — ~8 VPU ops per
        # (query, pixel) element instead of ~36 for the joint build over the
        # flat grid (same corner weights; f32 mul reassociation only).
        colx = jnp.arange(w, dtype=jnp.float32)
        rowy = jnp.arange(h, dtype=jnp.float32)
        wm = None
        for pi in range(p):
            hx = jnp.maximum(
                0.0, 1.0 - jnp.abs(x[..., pi, None] - colx)
            ) * aw[..., pi, None]                          # (B, M, Lq, w)
            hy = jnp.maximum(
                0.0, 1.0 - jnp.abs(y[..., pi, None] - rowy)
            )                                              # (B, M, Lq, h)
            term = hy[..., :, None] * hx[..., None, :]     # (B, M, Lq, h, w)
            wm = term if wm is None else wm + term
        wm = wm.reshape(b, m, lq, hw).astype(dtype)  # (B, M, Lq, HW)
        out = out + jnp.einsum("bmqs,bmsd->bmqd", wm, vl,
                               preferred_element_type=jnp.float32)
        start += hw

    # (B, M, Lq, D) -> (B, Lq, M*D)
    return out.astype(dtype).transpose(0, 2, 1, 3).reshape(b, lq, m * d)


@functools.lru_cache(maxsize=None)
def _band_geometry(spatial_shapes: Tuple[Tuple[int, int], ...], radius: int,
                   tile_queries: int = 512):
    """Static banding plan for encoder self-attention (queries == pixels).

    For each (query level ql, sampling level lvl) pair: queries are grouped
    into tiles of `tq` consecutive rows of the ql grid; a tile's taps — bounded
    by `radius` sampling-level pixels around the reference row — land in a
    fixed horizontal BAND of the lvl grid, so the bilinear hat build only has
    to cover band_rows * W_lvl columns instead of H_lvl * W_lvl. Rows near the
    image border clip the band inward (coverage there is strictly wider).

    Returns {(ql, lvl): None | (tq, band_rows, starts tuple)} — None means the
    band would cover the whole level (no banding win; caller uses the dense
    hat build for that pair).
    """
    plan = {}
    for ql, (hq, wq) in enumerate(spatial_shapes):
        # largest divisor of hq with tq*wq <= tile_queries (>=1 row)
        tq = 1
        for cand in range(1, hq + 1):
            if hq % cand == 0 and cand * wq <= max(tile_queries, wq):
                tq = cand
        for lvl, (h, w) in enumerate(spatial_shapes):
            scale = h / hq
            # reference row (pixel coords) of query row r: (r + 0.5)*scale - 0.5
            # tile t covers query rows [t*tq, (t+1)*tq); corners add +-1 row
            lo_off = 0.5 * scale - 0.5 - radius
            hi_off = (tq - 0.5) * scale - 0.5 + radius
            band_rows = int(np.floor(hi_off) + 1 - np.floor(lo_off)) + 1
            if band_rows >= h:
                plan[(ql, lvl)] = None
                continue
            starts = []
            for t in range(hq // tq):
                s = int(np.floor(t * tq * scale + lo_off))
                starts.append(max(0, min(s, h - band_rows)))
            plan[(ql, lvl)] = (tq, band_rows, tuple(starts))
    return plan


def _band_axis_plan(nq_ax: int, nv_ax: int, radius: int, tile: int):
    """1-axis blocking plan: queries along one grid axis (nq_ax long) are
    tiled into runs of t (largest divisor of nq_ax <= tile); each run's taps
    — bounded by `radius` sampling-level pixels around the reference point,
    +-1 for the bilinear corners — fall in a length-`band` window of the
    value axis (nv_ax long), whose clamped start is per-tile static.

    Returns (t, band, starts). If the window would cover the whole axis the
    plan degenerates to one tile spanning everything: (nq_ax, nv_ax, (0,)).
    """
    t = 1
    for cand in range(1, nq_ax + 1):
        if nq_ax % cand == 0 and cand <= max(tile, 1):
            t = cand
    scale = nv_ax / nq_ax
    # reference coord (pixel units) of query index i: (i + 0.5)*scale - 0.5
    lo_off = 0.5 * scale - 0.5 - radius
    hi_off = (t - 0.5) * scale - 0.5 + radius
    band = int(np.floor(hi_off) + 1 - np.floor(lo_off)) + 1
    if band >= nv_ax:
        return (nq_ax, nv_ax, (0,))
    starts = []
    for i in range(nq_ax // t):
        s = int(np.floor(i * t * scale + lo_off))
        starts.append(max(0, min(s, nv_ax - band)))
    return (t, band, tuple(starts))


@functools.lru_cache(maxsize=None)
def _band_geometry_2d(spatial_shapes: Tuple[Tuple[int, int], ...],
                      radius: int, tile: int):
    """2-D blocking plan: like _band_geometry but queries are tiled in
    (tile x tile)-capped 2-D blocks of the ql grid, and each block contracts
    against a (band_rows x band_cols) BLOCK of the lvl grid — the hat build
    shrinks along both image axes. Returns
    {(ql, lvl): None | (tqy, band_rows, ystarts, tqx, band_cols, xstarts)};
    None means neither axis bands (dense hat build)."""
    plan = {}
    for ql, (hq, wq) in enumerate(spatial_shapes):
        for lvl, (h, w) in enumerate(spatial_shapes):
            ypl = _band_axis_plan(hq, h, radius, tile)
            xpl = _band_axis_plan(wq, w, radius, tile)
            if ypl[1] >= h and xpl[1] >= w:
                plan[(ql, lvl)] = None
            else:
                plan[(ql, lvl)] = ypl + xpl
    return plan


def _ms_deform_attn_banded(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    radius: int,
    tile_queries: int = 512,
    tile_x: Optional[int] = None,
) -> jnp.ndarray:
    """Banded-hat MXU formulation for encoder self-attention (Lq == S).

    Same hat-product LHS as _ms_deform_attn_onehot, but each query-row tile
    contracts only against its static band of sampling rows — the VPU hat
    build (the profiled bottleneck: ~45% of the stage-3 step, PERF.md
    roofline) shrinks by HW/band per pair (~2.7x total at the 640^2
    geometry). EXACTNESS CONTRACT: identical to the dense modes while every
    tap's bilinear corners stay within `radius` rows of the query's reference
    row (true at the deformable-DETR offset init, which caps offsets at
    n_points=4 level pixels, and measurable on trained weights with
    msda_band_oob_fraction); taps escaping the band read zero, exactly like
    zero-padding. Replaces the reference CUDA gather's arbitrary-offset reach
    (ms_deform_im2col_cuda.cuh:243) with a locality contract + counter.
    """
    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    if lq != s:
        raise ValueError(
            f"banded mode requires queries == pixels (Lq {lq} != S {s}); "
            "use onehot_mxu for decoder-style queries")
    dtype = value.dtype
    if tile_x is None:
        plan = _band_geometry(tuple(spatial_shapes), int(radius),
                              int(tile_queries))
    else:
        plan = _band_geometry_2d(tuple(spatial_shapes), int(radius),
                                 int(tile_x))

    val = value.transpose(0, 2, 1, 3)  # (B, M, S, D)
    loc = sampling_locations.transpose(0, 2, 1, 4, 3, 5)  # (B, M, Lq, P, L, 2)
    attw = attention_weights.transpose(0, 2, 1, 4, 3).astype(jnp.float32)

    out_chunks = []  # per query level, (B, M, HWq, D) f32
    q_start = 0
    for ql, (hq, wq) in enumerate(spatial_shapes):
        nq = hq * wq
        acc = jnp.zeros((b, m, nq, d), jnp.float32)
        v_start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            hw = h * w
            vl = val[:, :, v_start : v_start + hw]
            x = loc[:, :, q_start : q_start + nq, :, lvl, 0] * w - 0.5
            y = loc[:, :, q_start : q_start + nq, :, lvl, 1] * h - 0.5
            aw = attw[:, :, q_start : q_start + nq, :, lvl]  # (B, M, nq, P)
            geom = plan[(ql, lvl)]
            if geom is None:
                # band covers the level: dense hat build (identical to
                # onehot). The 2-D hat is SEPARABLE — build thin (nq, w) /
                # (nq, h) per-axis hats and combine them as a broadcast
                # outer product: ~8 VPU ops per (query, pixel) element vs
                # ~36 for the joint build (same corner weights, same
                # P-unrolled accumulation, bit-identical up to f32 mul
                # reassociation hx*aw vs hx*hy*aw).
                colx = jnp.arange(w, dtype=jnp.float32)
                rowy = jnp.arange(h, dtype=jnp.float32)
                wm = None
                for pi in range(p):
                    hx = jnp.maximum(
                        0.0, 1.0 - jnp.abs(x[..., pi, None] - colx)
                    ) * aw[..., pi, None]                      # (B, M, nq, w)
                    hy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(y[..., pi, None] - rowy)
                    )                                          # (B, M, nq, h)
                    term = hy[..., :, None] * hx[..., None, :]
                    wm = term if wm is None else wm + term
                acc = acc + jnp.einsum(
                    "bmqs,bmsd->bmqd",
                    wm.reshape(b, m, nq, hw).astype(dtype), vl,
                    preferred_element_type=jnp.float32)
            elif len(geom) == 6:
                # 2-D blocking: (tqy x tqx) query tiles vs
                # (band_rows x band_cols) value blocks
                tqy, br, ys, tqx, bc, xs = geom
                n_ty, n_tx = hq // tqy, wq // tqx
                t_tiles, tq2, sb2 = n_ty * n_tx, tqy * tqx, br * bc

                def _tile_q(a):  # (B, M, nq, P) -> (B, M, T, tq2, P)
                    a = a.reshape(b, m, n_ty, tqy, n_tx, tqx, p)
                    return a.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                        b, m, t_tiles, tq2, p)

                xt, yt, awt = _tile_q(x), _tile_q(y), _tile_q(aw)
                v4 = vl.reshape(b, m, h, w, d)
                blocks = []
                for ys_ in ys:
                    rows = jax.lax.slice_in_dim(v4, ys_, ys_ + br, axis=2)
                    for xs_ in xs:
                        blk = jax.lax.slice_in_dim(rows, xs_, xs_ + bc,
                                                   axis=3)
                        blocks.append(blk.reshape(b, m, sb2, d))
                vband = jnp.stack(blocks, axis=2)  # (B, M, T, Sb2, D)
                # static per-tile pixel coordinates of the block rows/cols;
                # separable thin-hat build (see the dense branch above):
                # (tq2, br) x (tq2, bc) outer product instead of a joint
                # (tq2, sb2) hat — block pixels are y-major so the
                # (..., br, bc) outer product reshapes to Sb2 exactly
                coly = (np.asarray(ys, np.float32)[:, None]
                        + np.arange(br, dtype=np.float32))      # (n_ty, br)
                colx = (np.asarray(xs, np.float32)[:, None]
                        + np.arange(bc, dtype=np.float32))      # (n_tx, bc)
                coly = jnp.asarray(
                    np.broadcast_to(coly[:, None, :], (n_ty, n_tx, br))
                    .reshape(t_tiles, br))[None, None, :, None, :]
                colx = jnp.asarray(
                    np.broadcast_to(colx[None, :, :], (n_ty, n_tx, bc))
                    .reshape(t_tiles, bc))[None, None, :, None, :]
                wm = None
                for pi in range(p):
                    hx = jnp.maximum(
                        0.0, 1.0 - jnp.abs(xt[..., pi, None] - colx)
                    ) * awt[..., pi, None]                  # (B, M, T, tq2, bc)
                    hy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(yt[..., pi, None] - coly)
                    )                                       # (B, M, T, tq2, br)
                    term = hy[..., :, None] * hx[..., None, :]
                    wm = term if wm is None else wm + term
                tile_out = jnp.einsum(
                    "bmtqs,bmtsd->bmtqd",
                    wm.reshape(b, m, t_tiles, tq2, sb2).astype(dtype), vband,
                    preferred_element_type=jnp.float32)
                tile_out = tile_out.reshape(b, m, n_ty, n_tx, tqy, tqx, d)
                acc = acc + tile_out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                    b, m, nq, d)
            else:
                tq, band_rows, starts = geom
                n_tiles, tqq, sb = len(starts), tq * wq, band_rows * w
                vband = jnp.stack(
                    [jax.lax.slice_in_dim(vl, st * w, (st + band_rows) * w,
                                          axis=2) for st in starts],
                    axis=2)  # (B, M, T, Sb, D)
                xt = x.reshape(b, m, n_tiles, tqq, p)
                yt = y.reshape(b, m, n_tiles, tqq, p)
                awt = aw.reshape(b, m, n_tiles, tqq, p)
                # separable thin-hat build (see the dense branch above): the
                # band is band_rows full rows, so the (tqq, Sb) hat is the
                # outer product of a (tqq, w) column hat and a
                # (tqq, band_rows) row hat — Sb = band_rows * w y-major
                colx = jnp.arange(w, dtype=jnp.float32)       # (w,)
                rowy = (jnp.asarray(starts, jnp.float32)[:, None]
                        + jnp.arange(band_rows, dtype=jnp.float32)[None, :])
                rowy = rowy[None, None, :, None, :]           # (1,1,T,1,rows)
                wm = None
                for pi in range(p):
                    hx = jnp.maximum(
                        0.0, 1.0 - jnp.abs(xt[..., pi, None] - colx)
                    ) * awt[..., pi, None]                 # (B, M, T, tqq, w)
                    hy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(yt[..., pi, None] - rowy)
                    )                                      # (B, M, T, tqq, rows)
                    term = hy[..., :, None] * hx[..., None, :]
                    wm = term if wm is None else wm + term
                tile_out = jnp.einsum(
                    "bmtqs,bmtsd->bmtqd",
                    wm.reshape(b, m, n_tiles, tqq, sb).astype(dtype), vband,
                    preferred_element_type=jnp.float32)
                acc = acc + tile_out.reshape(b, m, nq, d)
            v_start += hw
        out_chunks.append(acc)
        q_start += nq

    out = jnp.concatenate(out_chunks, axis=2)  # (B, M, Lq, D)
    return out.astype(dtype).transpose(0, 2, 1, 3).reshape(b, lq, m * d)


def msda_band_oob_fraction(
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    radius: int = 6,
    tile_queries: int = 512,
    tile_x: Optional[int] = None,
) -> jnp.ndarray:
    """Fraction of attention mass whose taps fall OUTSIDE the banded-mode
    coverage window (the runtime counter for the banded kernel's locality
    contract). 0.0 means banded == dense exactly; report alongside any run
    that enables mode="banded" on trained weights.

    A tap is out-of-band if either bilinear corner row lies inside the image
    but outside the tile's band (corners outside the image read zero in every
    mode and are therefore never counted). With ``tile_x`` set the counter
    uses the 2-D blocking plan and applies the same test per axis (corner
    rows against the tile's row band AND corner columns against its column
    band) — pass the production ``band_tile_x`` to audit 2-D banded runs.
    """
    b, lq, m, num_levels, p, _ = sampling_locations.shape
    s = sum(h * w for h, w in spatial_shapes)
    if lq != s:
        raise ValueError("oob counter requires queries == pixels (Lq == S)")
    if tile_x is None:
        plan = _band_geometry(tuple(spatial_shapes), int(radius),
                              int(tile_queries))
    else:
        plan = _band_geometry_2d(tuple(spatial_shapes), int(radius),
                                 int(tile_x))

    total = jnp.sum(attention_weights.astype(jnp.float32))
    oob = jnp.zeros((), jnp.float32)
    q_start = 0
    for ql, (hq, wq) in enumerate(spatial_shapes):
        nq = hq * wq
        for lvl, (h, w) in enumerate(spatial_shapes):
            geom = plan[(ql, lvl)]
            if geom is None:
                continue
            aw = attention_weights[:, q_start : q_start + nq, :, lvl].astype(
                jnp.float32)
            if len(geom) == 6:
                tqy, br, ys, tqx, bc, xs = geom
                n_ty, n_tx = hq // tqy, wq // tqx
                locs = sampling_locations[:, q_start : q_start + nq, :, lvl]
                ypix = locs[..., 1] * h - 0.5  # (B, nq, M, P)
                xpix = locs[..., 0] * w - 0.5

                def _rt(a):  # (B, nq, M, P) -> 2-D query tiles
                    return a.reshape(b, n_ty, tqy, n_tx, tqx, m, p)

                ypix, xpix, awt = _rt(ypix), _rt(xpix), _rt(aw)
                sty = jnp.asarray(ys, jnp.float32)[
                    None, :, None, None, None, None, None]
                stx = jnp.asarray(xs, jnp.float32)[
                    None, None, None, :, None, None, None]
                bad = jnp.zeros(ypix.shape, bool)
                for pix, st, band, extent in ((ypix, sty, br, h),
                                              (xpix, stx, bc, w)):
                    c0 = jnp.floor(pix)
                    for corner in (c0, c0 + 1.0):
                        inside_img = (corner >= 0) & (corner <= extent - 1)
                        inside_band = (corner >= st) & (corner <= st + band - 1)
                        bad = bad | (inside_img & ~inside_band)
                oob = oob + jnp.sum(awt * bad)
            else:
                tq, band_rows, starts = geom
                n_tiles = len(starts)
                y = (sampling_locations[:, q_start : q_start + nq, :, lvl, :,
                                        1] * h - 0.5)  # (B, nq, M, P)
                y = y.reshape(b, n_tiles, nq // n_tiles, m, p)
                awt = aw.reshape(b, n_tiles, nq // n_tiles, m, p)
                st = jnp.asarray(starts, jnp.float32)[None, :, None, None,
                                                      None]
                y0 = jnp.floor(y)
                bad = jnp.zeros(y.shape, bool)
                for corner in (y0, y0 + 1.0):
                    inside_img = (corner >= 0) & (corner <= h - 1)
                    inside_band = (corner >= st) & (corner <= st + band_rows
                                                    - 1)
                    bad = bad | (inside_img & ~inside_band)
                oob = oob + jnp.sum(awt * bad)
        q_start += nq
    return oob / jnp.maximum(total, 1e-12)


def _ms_deform_attn_pallas_folded(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Pallas path: per level, the P-folded thin-hat kernel
    (ops/msda_pallas.sample_level_folded) builds each LHS tile from thin
    (TQ, W)/(TQ, H) hats in VMEM — ~7 VPU ops per (query, key) element vs
    ~44 for the XLA dense-hat fusion — and runs the same P-folded
    (TQ, HW) @ (HW, D) MXU contraction. Numerics identical to the other
    modes (same corner weights; f32 accumulation)."""
    from .msda_pallas import sample_level_folded

    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    dtype = value.dtype

    # (B, S, M, D) -> (BM, S, D) natural y-major flattening per level
    val = value.transpose(0, 2, 1, 3).reshape(b * m, s, d)
    # (B, Lq, M, L, P, 2) -> (BM, L, P, Lq, 2)
    loc = sampling_locations.transpose(0, 2, 3, 4, 1, 5).reshape(
        b * m, num_levels, p, lq, 2)
    attw = attention_weights.transpose(0, 2, 3, 4, 1).reshape(
        b * m, num_levels, p, lq).astype(jnp.float32)

    out = jnp.zeros((b * m, lq, d), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        hw = h * w
        vl = val[:, start : start + hw]
        x = loc[:, lvl, ..., 0] * w - 0.5  # (BM, P, Lq), align_corners=False
        y = loc[:, lvl, ..., 1] * h - 0.5
        out = out + sample_level_folded(vl, x, y, attw[:, lvl], h, w)
        start += hw

    # (BM, Lq, D) -> (B, Lq, M*D)
    return out.astype(dtype).reshape(b, m, lq, d).transpose(0, 2, 1, 3).reshape(
        b, lq, m * d)
