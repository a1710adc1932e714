"""Fused Swin MLP half-block (Pallas/TPU): LN -> fc1 -> GELU -> fc2 -> +residual.

One program per token tile keeps the normalized activations and the (T, 4C)
hidden entirely VMEM-resident, with both MLP weight matrices pinned in VMEM
across grid steps (constant block index -> fetched once). Targets the frozen
Swin-L trunk's res2-res4 stages (reference swin.py:178-301 Mlp +
SwinTransformerBlock tail); res5 (C=1536) exceeds VMEM for the weight pair
and stays on the XLA composition.

The trunk is FROZEN in every production stage (train_multi.sh:33-38,
train.sh:8), so this is a forward-only optimization; the backward falls back
to the XLA-composition VJP of ``ln_mlp_kernel_numerics`` — the f32-stat
composition matching THIS kernel's numerics path, so grads are of the same
function the forward computes (never taken under stop_gradient).

Numerics: LN statistics in f32 (like ops/layer_norm.py), matmul
accumulation f32, exact (erf) GELU in f32 — at bf16 weights this is slightly
MORE accurate than the unfused bf16-stat path it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_ln_mlp", "ln_mlp_reference"]

_LANE = 128


def ln_mlp_reference(x, scale, bias, w1, b1, w2, b2, eps=1e-5,
                     dtype=jnp.bfloat16, add_residual=True):
    """XLA composition with the SwinBlock's exact numerics (LN stats and
    matmuls in ``dtype`` except f32 accumulation via preferred type)."""
    xd = x.astype(dtype)
    mean = jnp.mean(xd, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xd), axis=-1, keepdims=True) - mean * mean
    y = (xd - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(dtype) + bias.astype(dtype)
    h = (y @ w1.astype(dtype) + b1.astype(dtype)).astype(dtype)
    h = jax.nn.gelu(h, approximate=False)
    o = (h @ w2.astype(dtype) + b2.astype(dtype)).astype(dtype)
    return x + o if add_residual else o


def ln_mlp_kernel_numerics(x, scale, bias, w1, b1, w2, b2, eps=1e-5,
                           add_residual=True):
    """XLA composition matching the PALLAS KERNEL's numerics path (f32 LN
    statistics, f32 matmul accumulation over compute-dtype operands, exact
    f32 GELU) — the function the custom VJP differentiates, so backward is
    the gradient of the same function the forward computes (within the A&S
    erf polynomial's 1.5e-7)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - mean * mean
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    h = jax.lax.dot_general(xn.astype(x.dtype), w1,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = 0.5 * h * (1.0 + jax.lax.erf(h * (2.0 ** -0.5)))
    y = jax.lax.dot_general(h.astype(x.dtype), w2,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2.astype(jnp.float32)
    if add_residual:
        return x + y.astype(x.dtype)
    return y.astype(x.dtype)


def _erf_f32(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf, |err| <= 1.5e-7 — far
    below bf16 activation resolution. Mosaic has no erf primitive
    (NotImplementedError: 'erf' in Pallas TPU lowering), so exact-GELU
    inside the kernel goes through this."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            eps: float, add_residual: bool):
    x = x_ref[...]                       # (T, C) compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - mean * mean
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    h = jax.lax.dot_general(xn.astype(x.dtype), w1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    # exact GELU in f32 (the model uses approximate=False; polynomial erf)
    h = 0.5 * h * (1.0 + _erf_f32(h * (2.0 ** -0.5)))
    y = jax.lax.dot_general(h.astype(x.dtype), w2_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    if add_residual:
        o_ref[...] = x + y.astype(x.dtype)
    else:
        o_ref[...] = y.astype(x.dtype)


def _fwd_pallas(x, scale, bias, w1, b1, w2, b2, eps, token_tile,
                add_residual=True, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape
    f = w1.shape[1]
    pad = (-n) % token_tile
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    npad = xp.shape[0]

    row = lambda a: a.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, add_residual=add_residual),
        out_shape=jax.ShapeDtypeStruct((npad, c), x.dtype),
        grid=(npad // token_tile,),
        in_specs=[
            pl.BlockSpec((token_tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((token_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, row(scale), row(bias), w1, row(b1), w2, row(b2))
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused(x, scale, bias, w1, b1, w2, b2, eps, token_tile, add_residual):
    return _fwd_pallas(x, scale, bias, w1, b1, w2, b2, eps, token_tile,
                       add_residual)


def _fused_fwd(x, scale, bias, w1, b1, w2, b2, eps, token_tile, add_residual):
    return (_fwd_pallas(x, scale, bias, w1, b1, w2, b2, eps, token_tile,
                        add_residual),
            (x, scale, bias, w1, b1, w2, b2))


def _fused_bwd(eps, token_tile, add_residual, res, g):
    # VJP of the KERNEL-numerics composition (f32 LN stats + f32 GELU, see
    # ln_mlp_kernel_numerics) so backward differentiates the same function
    # the Pallas forward computes; recompute-based. Never taken for the
    # frozen trunk (stop_gradient), correct if the backbone is unfrozen.
    x, scale, bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: ln_mlp_kernel_numerics(*a, eps=eps,
                                          add_residual=add_residual),
        x, scale, bias, w1, b1, w2, b2)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ln_mlp(x, scale, bias, w1, b1, w2, b2, eps: float = 1e-5,
                 token_tile: int = 256, add_residual: bool = True):
    """x: (..., C) -> (..., C), computing x + fc2(gelu(fc1(LN(x)))) — or just
    the branch fc2(gelu(fc1(LN(x)))) with ``add_residual=False`` (the
    stochastic-depth path scales the branch before its own residual add).

    Dispatches to the Pallas kernel on TPU when the weight pair fits VMEM
    (C <= 1024 covers Swin-L res2-res4); XLA composition otherwise.
    """
    c = x.shape[-1]
    f = w1.shape[1]
    # VMEM budget: both weights + one (T, F) f32 hidden + x/out tiles
    vmem = (c * f + f * c) * x.dtype.itemsize + token_tile * f * 4 \
        + 2 * token_tile * c * x.dtype.itemsize
    if jax.default_backend() != "tpu" or vmem > 14 * 2**20:
        return ln_mlp_reference(x, scale, bias, w1, b1, w2, b2, eps=eps,
                                dtype=x.dtype, add_residual=add_residual)
    lead = x.shape[:-1]
    flat = x.reshape(-1, c)
    out = _fused(flat, scale, bias, w1, b1, w2, b2, eps, token_tile,
                 add_residual)
    return out.reshape(*lead, c)
