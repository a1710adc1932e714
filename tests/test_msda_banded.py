"""Banded-hat MSDA (mode="banded") vs the dense modes.

The banded kernel's exactness contract: identical output while every tap's
bilinear corners stay within `band_radius` rows of the query's reference row
(ops/ms_deform_attn.py:_ms_deform_attn_banded); escaped taps read zero and
msda_band_oob_fraction measures the escaped attention mass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partdistillation_tpu.ops.ms_deform_attn import (
    _band_geometry,
    ms_deform_attn,
    msda_band_oob_fraction,
)

SHAPES = ((8, 8), (16, 16), (32, 32))  # res5-first, like the pixel decoder
# tile cap pinned small: at this tiny geometry the production default
# would cover whole levels and fall back to the dense path, making the
# banding tests vacuous
TQ = 128


def _grid_refs(shapes):
    """(S, L, 2) normalized pixel-center reference points (x, y)."""
    pts = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
    ref = np.concatenate(pts, 0)
    return np.broadcast_to(ref[:, None, :], (ref.shape[0], len(shapes), 2))


def _case(max_off_px=1.0, b=2, m=2, p=3, d=8, seed=0):
    rng = np.random.RandomState(seed)
    s = sum(h * w for h, w in SHAPES)
    value = rng.randn(b, s, m, d).astype(np.float32)
    ref = _grid_refs(SHAPES)[None, :, None, :, :]  # (1, S, 1, L, 2)
    off = rng.uniform(-max_off_px, max_off_px,
                      (b, s, m, len(SHAPES), p, 2)).astype(np.float32)
    norm = np.asarray([[w, h] for h, w in SHAPES], np.float32)
    loc = ref[:, :, :, :, None, :] + off / norm[None, None, None, :, None, :]
    w_raw = rng.rand(b, s, m, len(SHAPES), p).astype(np.float32)
    attw = w_raw / w_raw.sum((-1, -2), keepdims=True)
    return (jnp.asarray(value), jnp.asarray(loc.astype(np.float32)),
            jnp.asarray(attw))


def test_band_geometry_banding_kicks_in():
    plan = _band_geometry(SHAPES, radius=2, tile_queries=TQ)
    # the largest level banded against itself must get a real win
    geom = plan[(2, 2)]
    assert geom is not None
    tq, band_rows, starts = geom
    assert band_rows < 32 and len(starts) == 32 // tq
    # every band stays inside the level
    assert all(0 <= st <= 32 - band_rows for st in starts)


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_banded_matches_dense_within_radius():
    value, loc, attw = _case(max_off_px=1.0)
    dense = ms_deform_attn(value, SHAPES, loc, attw, mode="onehot_mxu")
    banded = ms_deform_attn(value, SHAPES, loc, attw, mode="banded",
                            band_radius=2, band_tile_queries=TQ)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)
    frac = msda_band_oob_fraction(SHAPES, loc, attw, radius=2, tile_queries=TQ)
    assert float(frac) == 0.0


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_banded_at_offset_init_radius():
    """The deformable-DETR init caps offsets at n_points pixels; radius
    n_points + 1 covers it (attention.py:_sampling_offset_bias_init)."""
    value, loc, attw = _case(max_off_px=3.0, p=3, seed=1)
    dense = ms_deform_attn(value, SHAPES, loc, attw, mode="take")
    banded = ms_deform_attn(value, SHAPES, loc, attw, mode="banded",
                            band_radius=4, band_tile_queries=TQ)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_oob_counter_flags_escaped_taps():
    value, loc, attw = _case(max_off_px=1.0, seed=2)
    # push one query's y taps 10 rows away at the largest level
    loc = loc.at[:, -1024:, :, 2, :, 1].add(10.0 / 32.0)
    frac = float(msda_band_oob_fraction(SHAPES, loc, attw, radius=2,
                                        tile_queries=TQ))
    assert frac > 0.0
    dense = ms_deform_attn(value, SHAPES, loc, attw, mode="onehot_mxu")
    banded = ms_deform_attn(value, SHAPES, loc, attw, mode="banded",
                            band_radius=2, band_tile_queries=TQ)
    # the escaped taps are exactly the divergence
    assert not np.allclose(np.asarray(banded), np.asarray(dense), atol=1e-4)


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_banded_gradients_match_dense():
    value, loc, attw = _case(max_off_px=1.0, b=1, m=1, p=2, d=4, seed=3)

    def loss(mode):
        def f(v, l, a):
            return jnp.sum(
                ms_deform_attn(v, SHAPES, l, a, mode=mode, band_radius=2,
                               band_tile_queries=TQ) ** 2)
        return f

    gd = jax.grad(loss("onehot_mxu"), argnums=(0, 1, 2))(value, loc, attw)
    gb = jax.grad(loss("banded"), argnums=(0, 1, 2))(value, loc, attw)
    for a, b_ in zip(gd, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_banded_rejects_decoder_queries():
    value, loc, attw = _case()
    with pytest.raises(ValueError, match="queries == pixels"):
        ms_deform_attn(value, SHAPES, loc[:, :10], attw[:, :10], mode="banded")


def test_band_geometry_default_cap_engages_at_production_geometry():
    """The production default tile cap (2048) must still band the 640^2
    pixel-decoder geometry (80/40/20 levels) — a regression guard for the
    tile-size default (see PERF.md round-3 banded-tiling notes)."""
    shapes = ((80, 80), (40, 40), (20, 20))
    plan = _band_geometry(shapes, radius=6)
    geom = plan[(0, 0)]  # largest level vs itself: the dominant cost pair
    assert geom is not None
    tq, band_rows, starts = geom
    assert tq * 80 <= 512 and 80 % tq == 0
    # the per-query build cost must beat the dense hat build by >= 2x
    assert band_rows * 80 / tq < 80 * 80 / 2


@pytest.mark.slow  # compile-heavy: re-tiered for fast-gate margin (round 4)
def test_banded_radius4_exact_at_production_offset_cap():
    """The bench default (radius 4) must be EXACT at the production offset
    distribution's boundary: the deformable-DETR init caps |offset| at
    exactly n_points = 4 level pixels and the frozen launch configs keep it
    there (PERF.md round-3 radius table). Bilinear corners at +-4.0 px are
    covered by the band geometry's +1 row."""
    value, loc, attw = _case(max_off_px=4.0, p=4, seed=7)
    dense = ms_deform_attn(value, SHAPES, loc, attw, mode="onehot_mxu")
    banded = ms_deform_attn(value, SHAPES, loc, attw, mode="banded",
                            band_radius=4, band_tile_queries=TQ)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)
    frac = msda_band_oob_fraction(SHAPES, loc, attw, radius=4,
                                  tile_queries=TQ)
    assert float(frac) == 0.0


# ---------------------------------------------------------------------------
# 2-D blocking (band_tile_x): tiles contract against (rows x cols) blocks
# ---------------------------------------------------------------------------

def test_band_geometry_2d_blocks_both_axes():
    from partdistillation_tpu.ops.ms_deform_attn import _band_geometry_2d

    shapes = ((80, 80), (40, 40), (20, 20))
    plan = _band_geometry_2d(shapes, radius=4, tile=16)
    tqy, br, ys, tqx, bc, xs = plan[(0, 0)]
    assert tqy == 16 and tqx == 16
    assert br < 80 and bc < 80
    assert len(ys) == 5 and len(xs) == 5
    assert all(0 <= s <= 80 - br for s in ys)
    assert all(0 <= s <= 80 - bc for s in xs)
    # the block build must beat the 1-D row band by >= 1.5x on this pair
    plan1d = _band_geometry(shapes, radius=4, tile_queries=512)
    tq, band_rows, _ = plan1d[(0, 0)]
    per_query_1d = band_rows * 80
    per_query_2d = br * bc
    assert per_query_2d * 1.5 < per_query_1d


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_banded2d_matches_dense_within_radius():
    value, loc, attw = _case(max_off_px=1.0)
    dense = ms_deform_attn(value, SHAPES, loc, attw, mode="onehot_mxu")
    banded = ms_deform_attn(value, SHAPES, loc, attw, mode="banded",
                            band_radius=2, band_tile_x=8)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)
    frac = msda_band_oob_fraction(SHAPES, loc, attw, radius=2, tile_x=8)
    assert float(frac) == 0.0


@pytest.mark.slow  # compile-heavy: re-tiered for fast-gate margin (round 4)
def test_banded2d_radius4_exact_at_production_offset_cap():
    value, loc, attw = _case(max_off_px=4.0, p=4, seed=7)
    dense = ms_deform_attn(value, SHAPES, loc, attw, mode="onehot_mxu")
    banded = ms_deform_attn(value, SHAPES, loc, attw, mode="banded",
                            band_radius=4, band_tile_x=8)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)
    frac = msda_band_oob_fraction(SHAPES, loc, attw, radius=4, tile_x=8)
    assert float(frac) == 0.0


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_banded2d_gradients_match_dense():
    value, loc, attw = _case(max_off_px=1.0, b=1, m=1, p=2, d=4, seed=3)

    def loss(mode, **kw):
        def f(v, l, a):
            return jnp.sum(
                ms_deform_attn(v, SHAPES, l, a, mode=mode, band_radius=2,
                               **kw) ** 2)
        return f

    gd = jax.grad(loss("onehot_mxu"), argnums=(0, 1, 2))(value, loc, attw)
    gb = jax.grad(loss("banded", band_tile_x=8), argnums=(0, 1, 2))(
        value, loc, attw)
    for a, b_ in zip(gd, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow  # compile-heavy: re-tiered for fast-gate margin (round 4)
def test_oob_counter_2d_flags_column_escapes():
    """Taps pushed sideways (columns) escape the 2-D block but stay inside
    the 1-D row band — only the tile_x counter must flag them."""
    value, loc, attw = _case(max_off_px=0.5, seed=5)
    # push one stripe of queries' x taps 12 columns away at the largest level
    loc = loc.at[:, -1024:, :, 2, :, 0].add(12.0 / 32.0)
    frac_rows = float(msda_band_oob_fraction(SHAPES, loc, attw, radius=2,
                                             tile_queries=TQ))
    frac_2d = float(msda_band_oob_fraction(SHAPES, loc, attw, radius=2,
                                           tile_x=8))
    assert frac_rows == 0.0
    assert frac_2d > 0.0
    dense = ms_deform_attn(value, SHAPES, loc, attw, mode="onehot_mxu")
    banded = ms_deform_attn(value, SHAPES, loc, attw, mode="banded",
                            band_radius=2, band_tile_x=8)
    assert not np.allclose(np.asarray(banded), np.asarray(dense), atol=1e-4)
