"""Fused LayerNorm (Pallas/TPU): one pass over HBM instead of XLA's
stats-reduce + normalize fusions.

Motivation (PERF.md round 3): the stage-3 step's Swin-res4 LayerNorm
statistics reductions — tuples like (f32[16,40,40] mean, f32[16,40,40]
var, ...) — cost ~0.9 ms per instance at 640² geometry, ~44 GB/s effective
on a ~800 GB/s part (the cross-lane reduce over the channel axis plus an
S(1)-staged tuple output), ~33 ms/step across res4's 38 LayerNorms alone.
This kernel reads each row block once, computes mean/variance in f32 on the
VPU, and writes the normalized+affine output — speed-of-light is one read +
one write. Measured end-to-end (BENCH_FUSED_LN A/B on the real chip) the
step is NEUTRAL: 27.40 vs 27.35 img/s — post-donation XLA overlaps the
stats reductions with neighbor ops. Kept as the default for the f32
statistics (more accurate than the bf16-stat path it replaces), not as a
throughput claim.

The backward is the standard analytic LayerNorm gradient, implemented in
plain XLA (`custom_vjp`): in the launch configs the trunk is frozen, so the
backward never runs in the hot path; it exists for correctness (tested
against autodiff of the reference composition).

Reference analog: torch nn.LayerNorm inside Swin blocks
(/root/reference/part_distillation/modeling/backbone/swin.py:178-301).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_layer_norm"]


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                     # (R, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32)[None, :] \
        + bias_ref[...].astype(jnp.float32)[None, :]
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_forward(x2d: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float, block_rows: int) -> jnp.ndarray:
    n, c = x2d.shape
    grid = (n // block_rows,)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
    )(x2d, scale, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln(x2d, scale, bias, eps):
    # block size: divide N into lane-friendly row blocks; fall back to a
    # single block (tiny inputs) — VMEM bound ~ block_rows * C * 6 bytes
    n = x2d.shape[0]
    block = 512
    while block > 1 and n % block:
        block //= 2
    return _ln_forward(x2d, scale, bias, eps, block)


def _ln_fwd(x2d, scale, bias, eps):
    return _ln(x2d, scale, bias, eps), (x2d, scale)


def _ln_bwd(eps, res, g):
    # analytic LayerNorm backward (plain XLA — cold path, trunk is frozen)
    x2d, scale = res
    x = x2d.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    gy = g32 * scale.astype(jnp.float32)[None, :]
    dx = (gy - jnp.mean(gy, axis=-1, keepdims=True)
          - xhat * jnp.mean(gy * xhat, axis=-1, keepdims=True)) * inv
    dscale = jnp.sum(g32 * xhat, axis=0)
    dbias = jnp.sum(g32, axis=0)
    return (dx.astype(x2d.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_ln.defvjp(_ln_fwd, _ln_bwd)


def fused_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis of ``x`` with affine (scale, bias).

    Numerics: statistics in f32 regardless of input dtype (matching flax
    ``nn.LayerNorm`` with default f32 param/computation dtype), output in
    ``x.dtype``. Falls back to the plain XLA composition off-TPU (Pallas
    CPU interpret mode is not production) and for shapes the kernel does
    not cover.
    """
    c = x.shape[-1]
    if jax.default_backend() != "tpu":
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)
    lead = x.shape[:-1]
    x2d = x.reshape(-1, c)
    out = _ln(x2d, scale, bias, eps)
    return out.reshape(*lead, c)
