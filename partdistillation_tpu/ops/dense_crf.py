"""Dense-CRF mean-field inference on device (XLA/TPU-native).

Replaces the reference's pydensecrf CPU farm (continuously_postprocess_dcrf.py
:23-51 + sh_files/dcrf/run.sh: up to 90 host processes, each ~seconds/image)
with a batched, jitted mean-field solver. Model (Krähenbühl & Koltun dense
CRF with Potts compatibility, the exact model pydensecrf evaluates):

  E(x) = sum_i U_i(x_i) + sum_{i<j} mu(x_i,x_j) [ w_g k_gauss(p_i,p_j)
                                                + w_b k_bilateral(p_i,c_i;p_j,c_j) ]

Mean-field update per iteration (Potts mu = [l != l']):
  Q_i(l) <- softmax_l( -U_i(l) + w_g * G[Q](i,l) + w_b * B[Q](i,l) )
with the self-interaction k(i,i)=1 subtracted from each message.

TPU mapping of the two message passes:
  * Gaussian kernel (sxy ~ 3px): exact truncated separable depthwise
    convolution — pure VPU work, fused by XLA.
  * Bilateral kernel (sxy ~ 20px, srgb ~ 13): a **windowed convolution at
    reduced resolution** (``bilateral_filter_conv``, the default): area-mean
    downsample by ~sxy/5, exact truncated Gaussian window over cell offsets
    (x-offsets vectorized as static patches, y-offsets a lax.scan), bilinear
    upsample. The image-dependent window weights are built ONCE per image and
    reused across mean-field iterations. Everything is static slices + small
    einsums — no gathers.
    Rationale: arbitrary gather/scatter runs ~100x off HBM speed-of-light on
    TPU (SMEM index staging), so any lattice/grid method is bandwidth-doomed;
    meanwhile the reference's permutohedral lattice itself quantizes the
    spatial axes at ~sxy spacing, so a conv approximation on a sxy/5 grid
    with a 2.5-sigma window is a *finer* discretization of the same kernel.
    Coarser grids (DenseCRFParams.bilateral_stride) trade quality for
    ~stride^4 less work — see the measured agreement table on the config
    field; the exact-golden multilabel test pins the default.
    A 5-D bilateral grid (``bilateral_filter``) is kept as the exact-color
    fallback; both are verified against brute-force bilateral filtering in
    tests/test_dense_crf.py.

Reference parameters (continuously_postprocess_dcrf.py:23): gt_prob p=0.7,
iters t=10, gaussian sxy=3 compat=3, bilateral sxy=20 srgb=13 compat=10
(utils/utils.py:50-78 uses t=5, bilateral sxy=5 for the in-training variant).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["DenseCRFParams", "dense_crf", "unary_from_masks",
           "gaussian_blur", "bilateral_filter", "bilateral_filter_conv"]


@dataclasses.dataclass(frozen=True)
class DenseCRFParams:
    gt_prob: float = 0.7
    iters: int = 10
    gauss_sxy: float = 3.0
    gauss_compat: float = 3.0
    bilateral_sxy: float = 20.0
    bilateral_srgb: float = 13.0
    bilateral_compat: float = 10.0
    # "conv" = windowed conv at reduced resolution (TPU-fast, default);
    # "grid" = 5-D bilateral grid (gather-bound, exact color resolution)
    bilateral_impl: str = "conv"
    # window-grid cell size in pixels for "conv"; None = sxy/5 (5 cells per
    # spatial sigma). Larger strides are measurably cheaper (work ~stride^-4)
    # but UNSAFE when part width ~ 4 strides: on the exact-golden multilabel
    # scene (16 px parts, sxy 20) agreement vs exact mean-field is 0.991 at
    # stride 4 but 0.852 at stride 5 and 0.764 at stride 8; on a 256^2 scene
    # with ~80 px parts stride 8 still agrees 0.983. Override only when the
    # smallest structure of interest spans >= ~6 strides.
    bilateral_stride: int | None = None


def _gauss_kernel_1d(sigma: float) -> jnp.ndarray:
    radius = max(int(math.ceil(2.0 * sigma)), 1)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k  # unnormalized, matching the CRF kernel k(f_i,f_j)=exp(-|d|^2/2s^2)


def gaussian_blur(x: jnp.ndarray, sigma: float, normalize: bool = False) -> jnp.ndarray:
    """Separable Gaussian filter over the two leading spatial dims of (H,W,C)."""
    k = _gauss_kernel_1d(sigma)
    if normalize:
        k = k / jnp.sum(k)
    pad = (k.shape[0] - 1) // 2

    def conv_axis(arr, axis):
        moved = jnp.moveaxis(arr, axis, -1)  # (..., H)
        shape = moved.shape
        flat = moved.reshape(-1, 1, shape[-1])
        out = jax.lax.conv_general_dilated(
            flat, k[None, None, :], window_strides=(1,),
            padding=[(pad, pad)], dimension_numbers=("NCH", "OIH", "NCH"))
        return jnp.moveaxis(out.reshape(shape), -1, axis)

    return conv_axis(conv_axis(x, 0), 1)


def _splat_blur_slice(coords: jnp.ndarray, values: jnp.ndarray,
                      grid_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Multilinear splat of `values` at fractional cell `coords` into a dense
    grid, sigma=1-cell Gaussian blur per axis, multilinear slice back.

    coords: (N, D) float cell positions in [0, grid_shape[d]-1];
    values: (N, C). Returns (N, C).
    """
    n, d = coords.shape
    c = values.shape[-1]
    strides = []
    total = 1
    for s in reversed(grid_shape):
        strides.append(total)
        total *= s
    strides = jnp.asarray(list(reversed(strides)), jnp.int32)

    lo = jnp.floor(coords)
    frac = coords - lo
    lo = lo.astype(jnp.int32)
    max_idx = jnp.asarray([s - 1 for s in grid_shape], jnp.int32)

    corner_idx = []
    corner_w = []
    for corner in range(1 << d):
        bits = jnp.asarray([(corner >> k) & 1 for k in range(d)], jnp.int32)
        idx = jnp.clip(lo + bits[None, :], 0, max_idx[None, :])
        wgt = jnp.prod(jnp.where(bits[None, :] == 1, frac, 1.0 - frac), axis=1)
        corner_idx.append(jnp.sum(idx * strides[None, :], axis=1))
        corner_w.append(wgt)
    corner_idx = jnp.stack(corner_idx)          # (2^D, N)
    corner_w = jnp.stack(corner_w)              # (2^D, N)

    grid = jnp.zeros((total, c), values.dtype)
    grid = grid.at[corner_idx.reshape(-1)].add(
        (corner_w[..., None] * values[None]).reshape(-1, c))
    grid = grid.reshape(*grid_shape, c)

    # Separable blur along each grid axis (3-tap, sigma = 1 cell), applied as
    # a tridiagonal-matrix contraction per axis. NOT jnp.roll: the 5-D grid's
    # small trailing dims take a T(8,128) layout padded ~6x (2.6 GB/buffer at
    # 640^2 — HBM OOM), while dots let XLA pick layouts and ride the MXU.
    w0 = math.exp(-0.5)
    for axis in range(d):
        s = grid.shape[axis]
        i = jnp.arange(s)
        diff = jnp.abs(i[:, None] - i[None, :])
        band = jnp.where(diff == 0, 1.0,
                         jnp.where(diff == 1, w0, 0.0)).astype(values.dtype)
        grid = jnp.moveaxis(
            jnp.tensordot(grid, band, axes=([axis], [0])), -1, axis)

    flat = grid.reshape(total, c)
    out = jnp.einsum("kn,knc->nc", corner_w, flat[corner_idx])
    return out


def bilateral_filter(image: jnp.ndarray, values: jnp.ndarray,
                     sxy: float, srgb: float) -> jnp.ndarray:
    """Joint-bilateral filtering of (H,W,C) `values` guided by (H,W,3) `image`
    via a 5-D bilateral grid. Returns unnormalized filtered values (the CRF
    message), i.e. sum_j k(i,j) v_j with k a separable Gaussian in (x,y,r,g,b).
    """
    h, w, c = values.shape
    gy = max(int(math.ceil(h / sxy)) + 2, 2)
    gx = max(int(math.ceil(w / sxy)) + 2, 2)
    gc = max(int(math.ceil(255.0 / srgb)) + 2, 2)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([
        jnp.clip(yy / sxy, 0.0, gy - 1.0),
        jnp.clip(xx / sxy, 0.0, gx - 1.0),
        jnp.clip(image[..., 0] / srgb, 0.0, gc - 1.0),
        jnp.clip(image[..., 1] / srgb, 0.0, gc - 1.0),
        jnp.clip(image[..., 2] / srgb, 0.0, gc - 1.0),
    ], axis=-1).reshape(-1, 5)

    out = _splat_blur_slice(coords, values.reshape(-1, c), (gy, gx, gc, gc, gc))
    return out.reshape(h, w, c)


def _xpatches(a: jnp.ndarray, r: int) -> jnp.ndarray:
    """(hl, wl, ac) -> (hl, wl, 2r+1, ac): all horizontal shifts within the
    window radius, zero-padded in x (static slices — no gathers)."""
    wl = a.shape[1]
    padded = jnp.pad(a, ((0, 0), (r, r), (0, 0)))
    return jnp.stack([padded[:, i:i + wl] for i in range(2 * r + 1)], axis=2)


def _bilateral_conv_setup(image: jnp.ndarray, sxy: float, srgb: float,
                          stride: int | None = None, truncate: float = 2.5):
    """Precompute the windowed-conv bilateral weights for a guide image.

    The weights depend only on the image, so a mean-field loop computes them
    ONCE and reuses them every iteration (the d2c + exp build is the
    expensive half of the filter). Returns (wgt, geom) where wgt is
    (ky, hl, wl, kx) and geom the static geometry tuple for apply."""
    h, w, _ = image.shape
    if stride is None:
        stride = max(1, int(round(sxy / 5.0)))
    ph, pw = (-h) % stride, (-w) % stride
    if ph or pw:
        image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
    hl, wl = image.shape[0] // stride, image.shape[1] // stride
    img_lo = (image.reshape(hl, stride, wl, stride, 3).mean((1, 3))
              if stride > 1 else image)

    s_lo = sxy / stride
    r = max(int(math.ceil(truncate * s_lo)), 1)
    kx = 2 * r + 1
    pi = jnp.pad(_xpatches(img_lo, r), ((r, r), (0, 0), (0, 0), (0, 0)))

    dx2 = jnp.arange(-r, r + 1, dtype=jnp.float32) ** 2          # (kx,)
    inv2ss = 0.5 / (s_lo * s_lo)
    inv2sr = 0.5 / (srgb * srgb)

    def wbody(_, dy):
        im = jax.lax.dynamic_slice(pi, (r + dy, 0, 0, 0), (hl, wl, kx, 3))
        d2c = jnp.sum((im - img_lo[:, :, None, :]) ** 2, axis=-1)
        wgt = jnp.exp(-(dy.astype(jnp.float32) ** 2 + dx2) * inv2ss
                      - d2c * inv2sr)
        return None, wgt

    _, wgt = jax.lax.scan(wbody, None, jnp.arange(-r, r + 1))
    return wgt, (h, w, hl, wl, stride, r)


def _bilateral_conv_apply(values: jnp.ndarray, wgt: jnp.ndarray,
                          geom) -> jnp.ndarray:
    """Apply precomputed bilateral window weights to (H,W,C) values.

    The x-window is contracted as 2r+1 STATIC shifted fused multiply-adds of
    the row slab — no (hl, wl, kx, c) patch tensor is ever materialized.
    The patch formulation profiled at ~2/3 of the whole CRF: a ~200 MB
    dynamic-slice + an equal layout copy per scan step at 640² geometry."""
    h, w, hl, wl, stride, r = geom
    c = values.shape[-1]
    kx = 2 * r + 1
    ph, pw = hl * stride - h, wl * stride - w
    if ph or pw:
        values = jnp.pad(values, ((0, ph), (0, pw), (0, 0)))
    val_lo = (values.reshape(hl, stride, wl, stride, c).mean((1, 3))
              if stride > 1 else values)
    # zero-padding val_lo zeroes out-of-bounds contributions outright, so no
    # validity mask is needed (the message is unnormalized)
    pv = jnp.pad(val_lo, ((r, r), (r, r), (0, 0)))

    def body(acc, inp):
        dy, wy = inp  # wy: (hl, wl, kx)
        rows = jax.lax.dynamic_slice(pv, (r + dy, 0, 0), (hl, wl + 2 * r, c))
        s = wy[:, :, 0, None] * rows[:, :wl]
        for dx in range(1, kx):  # static shifts — fuse, never materialize
            s = s + wy[:, :, dx, None] * rows[:, dx : dx + wl]
        return acc + s, None

    acc0 = jnp.zeros((hl, wl, c), values.dtype)
    msg, _ = jax.lax.scan(body, acc0, (jnp.arange(-r, r + 1), wgt))
    msg = msg * float(stride * stride)
    if stride > 1:
        msg = jax.image.resize(msg, (hl * stride, wl * stride, c), "linear")
    return msg[:h, :w]


def bilateral_filter_conv(image: jnp.ndarray, values: jnp.ndarray,
                          sxy: float, srgb: float, stride: int | None = None,
                          truncate: float = 2.5) -> jnp.ndarray:
    """Joint-bilateral filtering of (H,W,C) `values` guided by (H,W,3) `image`
    as a truncated windowed convolution at ``stride``-reduced resolution.
    Returns unnormalized filtered values, sum_j k(i,j) v_j, like
    ``bilateral_filter`` but gather-free (TPU-fast).

    The image/values are area-mean downsampled by ``stride`` (default
    ~sxy/5, so the cell grid is 5 cells per spatial sigma — finer than the
    reference permutohedral lattice's ~1 cell per sigma), the exact Gaussian
    kernel is applied over all cell offsets within ``truncate`` sigma
    (x-offsets vectorized as static shifted slices, y-offsets a lax.scan of
    dynamic slices from a padded buffer), and the message is scaled by
    stride^2 (each cell stands for stride^2 pixels) and bilinearly upsampled.
    """
    wgt, geom = _bilateral_conv_setup(image, sxy, srgb, stride, truncate)
    return _bilateral_conv_apply(values, wgt, geom)


def unary_from_masks(masks: jnp.ndarray, valid: jnp.ndarray,
                     gt_prob: float) -> jnp.ndarray:
    """Composite label map -> unary -log probabilities (H, W, L+1).

    Port of the reference's unary construction: binary part masks are merged
    into one label image (background = 0) and each pixel's observed label gets
    probability `gt_prob`, the rest uniform (continuously_postprocess_dcrf.py
    :144-153 with pydensecrf unary_from_labels semantics).

    masks: (T, H, W) bool (or f32 from the loader, thresholded at 0.5),
    valid: (T,) bool. Label t occupies channel t+1.
    """
    t, h, w = masks.shape
    if masks.dtype != jnp.bool_:
        masks = masks > 0.5
    m = masks & valid[:, None, None]
    # later masks overwrite earlier ones, background where none
    label = jnp.zeros((h, w), jnp.int32)
    for i in range(t):
        label = jnp.where(m[i], i + 1, label)
    n_labels = t + 1
    p_other = (1.0 - gt_prob) / (n_labels - 1)
    onehot = jax.nn.one_hot(label, n_labels)
    probs = onehot * gt_prob + (1.0 - onehot) * p_other
    return -jnp.log(probs)


@partial(jax.jit, static_argnames=("params",))
def dense_crf(image: jnp.ndarray, unary: jnp.ndarray,
              params: DenseCRFParams = DenseCRFParams()) -> jnp.ndarray:
    """Mean-field dense-CRF. image (H,W,3) in [0,255]; unary (H,W,L) -log p.

    Returns refined label probabilities Q (H,W,L).
    """
    log_unary = -unary
    q = jax.nn.softmax(log_unary, axis=-1)

    if params.bilateral_impl == "conv":
        # the window weights depend only on the image: build once, reuse
        # every mean-field iteration (saves the d2c + exp recompute, the
        # expensive half of the filter)
        wgt, geom = _bilateral_conv_setup(
            image, params.bilateral_sxy, params.bilateral_srgb,
            params.bilateral_stride)

        def bilat(q):
            return _bilateral_conv_apply(q, wgt, geom)
    else:
        def bilat(q):
            return bilateral_filter(image, q, params.bilateral_sxy,
                                    params.bilateral_srgb)

    def body(_, q):
        m_gauss = gaussian_blur(q, params.gauss_sxy) - q  # subtract self (k(i,i)=1)
        m_bilat = bilat(q) - q
        logits = (log_unary
                  + params.gauss_compat * m_gauss
                  + params.bilateral_compat * m_bilat)
        return jax.nn.softmax(logits, axis=-1)

    return jax.lax.fori_loop(0, params.iters, body, q)
