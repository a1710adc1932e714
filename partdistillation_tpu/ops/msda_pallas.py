"""Pallas TPU kernel for deformable-attention bilinear sampling.

The XLA formulation (ops/ms_deform_attn.py onehot_mxu) contracts a dense
(taps, H*W) hat-product matrix on the MXU; its cost is dominated by building
that matrix (taps x H*W VPU work per level). This kernel exploits the
separability of bilinear interpolation to shrink the build to two thin hat
matrices and keep every intermediate in VMEM:

    out[n, :] = sum_y hy[n, y] * ( hx[n, :] @ V[:, y, :] )

per point-tile of TN taps:
    hx: (TN, W) hat weights (2 non-zeros/row)     — VPU build, W wide not H*W
    R = hx @ V'                                    — MXU, V' = (W, H*D)
    out[n, d] = sum_y hy[n, y] * R[n, y*D+d]       — VPU, unrolled over H

VMEM residency: the level's values V' (W, H*D) load once per (batch*head) and
stay resident across all point tiles (the tile grid's index_map is constant in
the tile coordinate); R (TN, H*D) and the hat tiles are scratch-free locals.

Gradients: the kernel is wrapped in jax.custom_vjp whose backward runs the
XLA hat-product composition's VJP — both compute the identical function
(tests/test_msda_pallas.py), so the pairing is exact. Stage-3/5 training
freezes the deformable encoder (SURVEY.md §6), so the forward kernel is the
hot path and the backward rarely runs.

Reference parity: ms_deformable_im2col_gpu_kernel
(ops/src/cuda/ms_deform_im2col_cuda.cuh:243) is the CUDA analog of this
forward; the six col2im backward variants (:307-851) correspond to the VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sample_level", "sample_level_folded"]

_TN = 256  # taps per tile; R scratch = TN * H*D * 4B
_TQ = 256  # queries per program in the folded kernel


def _kernel_expand(x_ref, y_ref, w_ref, v_ref, e_ref, sel_ref, o_ref, *,
                   h: int, w: int, tn: int, chunk: int):
    """Lean variant: the VPU hat-build work per (H*D) element drops from ~7
    ops (full hyb hat + two multiplies) to ~2 (one multiply + one convert) by
    (a) folding the attention weight into the THIN hx hat (TN x W ops), and
    (b) expanding the thin hy hat (TN, H) onto the (H*D) layout with a 0/1
    expansion MATMUL on the otherwise-idle MXU instead of rebuilding the hat
    per column. Mosaic constraint: everything stays 2-D (3-D reshapes /
    broadcasts crash the TPU compiler backend)."""
    d = v_ref.shape[-1] // h
    c = pl.program_id(1)
    dtype = v_ref.dtype

    def tile(i, _):
        start = c * chunk + i * tn
        xs = x_ref[0, 0, pl.ds(start, tn)]  # (TN,)
        ys = y_ref[0, 0, pl.ds(start, tn)]
        ws = w_ref[0, 0, pl.ds(start, tn)]

        colw = jax.lax.broadcasted_iota(jnp.int32, (tn, w), 1).astype(jnp.float32)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - colw)) * ws[:, None]
        colh = jax.lax.broadcasted_iota(jnp.int32, (tn, h), 1).astype(jnp.float32)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - colh))  # (TN, H)

        r = jax.lax.dot_general(
            hx.astype(dtype), v_ref[0],  # (TN, W) @ (W, H*D)
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TN, H*D)
        hyb = jax.lax.dot_general(
            hy.astype(dtype), e_ref[:],  # (TN, H) @ (H, H*D) 0/1 expansion
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TN, H*D): hyb[n, y*d+j] = hy[n, y]
        r = (r * hyb).astype(dtype)
        acc = jax.lax.dot_general(
            r, sel_ref[:],  # (TN, H*D) @ (H*D, D) 0/1 y-sum
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TN, D)
        o_ref[0, pl.ds(i * tn, tn), :] = acc.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk // tn, tile, 0, unroll=False)


def _kernel(x_ref, y_ref, w_ref, v_ref, sel_ref, o_ref, *, h: int, w: int,
            tn: int, chunk: int):
    d = v_ref.shape[-1] // h
    c = pl.program_id(1)
    dtype = v_ref.dtype

    def tile(i, _):
        start = c * chunk + i * tn
        xs = x_ref[0, 0, pl.ds(start, tn)]  # (TN,)
        ys = y_ref[0, 0, pl.ds(start, tn)]
        ws = w_ref[0, 0, pl.ds(start, tn)]

        colw = jax.lax.broadcasted_iota(jnp.int32, (tn, w), 1).astype(jnp.float32)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - colw))  # (TN, W)
        # hy broadcast to the (H*D) layout directly: column j covers y = j // d
        colh = (jax.lax.broadcasted_iota(jnp.int32, (tn, h * d), 1) // d).astype(
            jnp.float32)
        hyb = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - colh))  # (TN, H*D)

        r = jax.lax.dot_general(
            hx.astype(dtype), v_ref[0],  # (TN, W) @ (W, H*D)
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TN, H*D)
        r = (r * hyb * ws[:, None]).astype(dtype)
        # sum over y groups: (TN, H*D) @ (H*D, D) 0/1 selection matrix
        acc = jax.lax.dot_general(
            r, sel_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TN, D)
        o_ref[0, pl.ds(i * tn, tn), :] = acc.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk // tn, tile, 0, unroll=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sample_level(v_whd, x, y, attw, h: int, w: int):
    """Weighted bilinear sampling of one level for all (batch*head) slices.

    Args:
      v_whd: (BM, W, H*D) values — x-major-transposed level image, bf16/f32.
      x, y: (BM, N) pixel-space fractional coords (align_corners=False).
      attw: (BM, N) folded attention weights.
      h, w: static level geometry.

    Returns:
      (BM, N, D) sampled values, dtype of v_whd.
    """
    return _forward(v_whd, x, y, attw, h, w)


def _forward(v_whd, x, y, attw, h, w, variant: str = "expand"):
    bm, n = x.shape
    d = v_whd.shape[-1] // h
    tn = _TN
    n_chunks = 8
    chunk = -(-n // (tn * n_chunks)) * tn
    n_pad = chunk * n_chunks
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        # padded taps sample at (-2,-2): hats are zero there -> zero output
        x = jnp.pad(x, pad, constant_values=-2.0)
        y = jnp.pad(y, pad, constant_values=-2.0)
        attw = jnp.pad(attw, pad)

    common = dict(
        grid=(bm, n_chunks),
        out_specs=pl.BlockSpec((1, chunk, d), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n_pad, d), v_whd.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU CI runs interpreted
    )
    # coords/weights + values: constant index over the chunk axis —
    # they load once per bm and stay VMEM-resident across chunks
    vec_specs = [
        pl.BlockSpec((1, 1, n_pad), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w, h * d), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
    ]

    if variant == "expand":
        import numpy as np

        eye_h = jnp.asarray(
            np.repeat(np.eye(h, dtype=np.float32), d, axis=1), v_whd.dtype)
        sel = jnp.tile(jnp.eye(d, dtype=v_whd.dtype), (h, 1))  # (H*D, D)
        out = pl.pallas_call(
            functools.partial(_kernel_expand, h=h, w=w, tn=tn, chunk=chunk),
            in_specs=vec_specs + [
                pl.BlockSpec((h, h * d), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h * d, d), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            **common,
        )(x[:, None, :], y[:, None, :], attw[:, None, :], v_whd, eye_h, sel)
    else:
        # 0/1 selection matrix summing the (y, d) layout over y:
        # sel[y*d+i, j]=[i==j]
        sel = jnp.tile(jnp.eye(d, dtype=v_whd.dtype), (h, 1))  # (H*D, D)
        out = pl.pallas_call(
            functools.partial(_kernel, h=h, w=w, tn=tn, chunk=chunk),
            in_specs=vec_specs + [
                pl.BlockSpec((h * d, d), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            **common,
        )(x[:, None, :], y[:, None, :], attw[:, None, :], v_whd, sel)
    return out[:, :n]


def _kernel_folded(x_ref, y_ref, w_ref, v_ref, o_ref, *, h: int, w: int,
                   p: int, tyc: int):
    """P-FOLDED thin-hat kernel: one output row per QUERY (not per tap).

    The XLA dense-hat build evaluates both hat functions inline at every
    (query, key) element — ~11 VPU ops per element per point, 44 with P=4
    (the build is ~90% of the level-0 fusion, profiled). Here the hats are
    built THIN once per query tile — hx (TQ, W), hy (TQ, H), attention
    weight folded into hx — and the dense LHS tile is assembled column-wise:
    for key row y the block is sum_p hy_p[:, y] * hxw_p, i.e. one static
    lane-slice broadcast + multiply + add per point (~7 ops/elem), all 2-D
    (Mosaic has no 3-D reshape/broadcast). Keys are tiled along y-ROWS so V
    stays in its natural y-major flat (H*W, D) layout — no relayout.

    The P points are folded into the LHS before the dot, so the MXU
    contraction is the same P-times-smaller (TQ, HW) @ (HW, D) product as
    the XLA form — unlike the per-tap kernels above, which do 4x the FLOPs.
    """
    dtype = v_ref.dtype
    tq = o_ref.shape[1]

    colw = jax.lax.broadcasted_iota(jnp.int32, (tq, w), 1).astype(jnp.float32)
    colh = jax.lax.broadcasted_iota(jnp.int32, (tq, h), 1).astype(jnp.float32)
    hxw, hy = [], []
    for pi in range(p):
        xs = x_ref[0, pi, :]
        ys = y_ref[0, pi, :]
        ws = w_ref[0, pi, :]
        hxw.append(jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - colw))
                   * ws[:, None])
        hy.append(jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - colh)))

    acc = jnp.zeros((tq, v_ref.shape[-1]), jnp.float32)
    for kt in range(h // tyc):
        cols = []
        for j in range(tyc):
            yy = kt * tyc + j
            col = None
            for pi in range(p):
                t = hy[pi][:, yy : yy + 1] * hxw[pi]  # (TQ, W)
                col = t if col is None else col + t
            cols.append(col)
        lhs = jnp.concatenate(cols, axis=1).astype(dtype)  # (TQ, tyc*W)
        vt = v_ref[0, pl.ds(kt * tyc * w, tyc * w), :]  # (tyc*W, D)
        acc = acc + jax.lax.dot_general(
            lhs, vt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sample_level_folded(v_sd, x, y, attw, h: int, w: int):
    """P-folded weighted bilinear sampling of one level (all batch*heads).

    Args:
      v_sd: (BM, H*W, D) values — natural y-major flattening, bf16/f32.
      x, y: (BM, P, N) pixel-space fractional coords per point
        (align_corners=False).
      attw: (BM, P, N) attention weights (softmax over levels x points done
        by the caller; only this level's P columns here).
      h, w: static level geometry.

    Returns:
      (BM, N, D) = sum_p attw_p * bilinear_sample(v, x_p, y_p), dtype of v.
    """
    return _forward_folded(v_sd, x, y, attw, h, w)


def _forward_folded(v_sd, x, y, attw, h, w, tq: int = _TQ):
    bm, p, n = x.shape
    d = v_sd.shape[-1]
    n_pad = -(-n // tq) * tq
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n))
        # padded queries sample at (-2,-2): hats are zero there -> zero rows
        x = jnp.pad(x, pad, constant_values=-2.0)
        y = jnp.pad(y, pad, constant_values=-2.0)
        attw = jnp.pad(attw, pad)
    # key tile = tyc full y-rows; pick the largest divisor of h with
    # tyc*w <= 1024 lanes (8 tiles of 128); very wide levels (w > 1024)
    # fall back to one row per tile (wider VMEM tiles, still valid)
    fits = [t for t in range(1, h + 1) if h % t == 0 and t * w <= 1024]
    tyc = max(fits) if fits else 1

    out = pl.pallas_call(
        functools.partial(_kernel_folded, h=h, w=w, p=p, tyc=tyc),
        grid=(bm, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, p, tq), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, tq), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, tq), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            # values: constant index over the query-chunk axis — loaded once
            # per bm slice and VMEM-resident across all query tiles
            pl.BlockSpec((1, h * w, d), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n_pad, d), v_sd.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU CI runs interpreted
    )(x, y, attw, v_sd)
    return out[:, :n]


def _xla_reference_folded(v_sd, x, y, attw, h, w):
    """Identical function as the XLA dense-hat composition (for the VJP)."""
    hw = h * w
    colx = jnp.arange(hw, dtype=jnp.float32) % w
    coly = jnp.floor(jnp.arange(hw, dtype=jnp.float32) / w)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - colx))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - coly))
    wm = jnp.sum(hx * hy * attw[..., None], axis=1).astype(v_sd.dtype)
    return jnp.einsum("bns,bsd->bnd", wm, v_sd,
                      preferred_element_type=jnp.float32).astype(v_sd.dtype)


def _fwd_folded(v_sd, x, y, attw, h, w):
    return _forward_folded(v_sd, x, y, attw, h, w), (v_sd, x, y, attw)


def _bwd_folded(h, w, res, g):
    v_sd, x, y, attw = res
    _, vjp = jax.vjp(lambda *a: _xla_reference_folded(*a, h, w),
                     v_sd, x, y, attw)
    return vjp(g)


sample_level_folded.defvjp(_fwd_folded, _bwd_folded)


def _xla_reference(v_whd, x, y, attw, h, w):
    """The identical function as XLA ops (for the VJP): dense hat product."""
    bm, n = x.shape
    d = v_whd.shape[-1] // h
    hw = h * w
    colx = jnp.arange(hw, dtype=jnp.float32) % w
    coly = jnp.floor(jnp.arange(hw, dtype=jnp.float32) / w)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - colx))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - coly))
    wm = (hx * hy).astype(v_whd.dtype)  # (BM, N, HW)
    # v_whd (BM, W, H*D) -> (BM, HW(y-major), D)
    v = v_whd.reshape(bm, w, h, d).transpose(0, 2, 1, 3).reshape(bm, hw, d)
    out = jnp.einsum("bns,bsd->bnd", wm, v, preferred_element_type=jnp.float32)
    return (out * attw[..., None]).astype(v_whd.dtype)


def _fwd(v_whd, x, y, attw, h, w):
    return _forward(v_whd, x, y, attw, h, w), (v_whd, x, y, attw)


def _bwd(h, w, res, g):
    v_whd, x, y, attw = res
    _, vjp = jax.vjp(lambda *a: _xla_reference(*a, h, w), v_whd, x, y, attw)
    return vjp(g)


sample_level.defvjp(_fwd, _bwd)
