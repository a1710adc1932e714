"""Golden quality-parity for the on-device dense CRF (SURVEY hard-part #4).

pydensecrf is not installable here, so the golden is an INDEPENDENT exact
brute-force mean-field solver (this file): the Krähenbühl-Koltun model with
full N^2 Gaussian + bilateral message passing in float64 — the computation
pydensecrf itself only approximates (its permutohedral lattice quantizes the
feature space at ~1 cell/sigma). Our bilateral-window/grid approximations are
compared against this exact solver at the reference's parameters
(continuously_postprocess_dcrf.py:23-51: gt_prob .7, 10 iters, gauss sxy 3
compat 3, bilateral sxy 20 srgb 13 compat 10; utils/utils.py:50-78:
in-training variant t=5, bilateral sxy 5).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from partdistillation_tpu.ops.dense_crf import (
    DenseCRFParams,
    dense_crf,
    unary_from_masks,
)

pytestmark = pytest.mark.slow  # N^2 float64 golden solver


def exact_mean_field(image: np.ndarray, unary: np.ndarray,
                     p: DenseCRFParams) -> np.ndarray:
    """Exact dense-CRF mean field: full pairwise message matrices, float64.

    Q_i(l) <- softmax_l( -U_i(l) + w_g sum_{j!=i} k_g(i,j) Q_j(l)
                                 + w_b sum_{j!=i} k_b(i,j) Q_j(l) )
    (Potts compatibility: the label-constant term drops in the softmax.)
    """
    h, w, L = unary.shape
    n = h * w
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    col = image.reshape(n, 3).astype(np.float64)

    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    c2 = ((col[:, None] - col[None]) ** 2).sum(-1)
    kg = np.exp(-d2 / (2 * p.gauss_sxy ** 2))
    kb = np.exp(-d2 / (2 * p.bilateral_sxy ** 2)
                - c2 / (2 * p.bilateral_srgb ** 2))
    np.fill_diagonal(kg, 0.0)  # self-interaction excluded
    np.fill_diagonal(kb, 0.0)

    logu = -unary.reshape(n, L).astype(np.float64)

    def softmax(z):
        z = z - z.max(-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(-1, keepdims=True)

    q = softmax(logu)
    for _ in range(p.iters):
        q = softmax(logu + p.gauss_compat * (kg @ q)
                    + p.bilateral_compat * (kb @ q))
    return q.reshape(h, w, L)


def _scene(h=48, w=48, seed=0):
    """Two color regions with a vertical edge at w//2 + a noisy initial mask
    whose jagged boundary disagrees with the color edge by a few pixels."""
    rng = np.random.RandomState(seed)
    image = np.zeros((h, w, 3), np.float32)
    image[:, : w // 2] = [170.0, 40.0, 40.0]
    image[:, w // 2:] = [40.0, 170.0, 40.0]
    image += rng.randn(h, w, 3).astype(np.float32) * 8.0
    image = np.clip(image, 0, 255)

    true_mask = np.zeros((h, w), bool)
    true_mask[:, w // 2:] = True
    noisy = true_mask.copy()
    jag = rng.randint(-3, 4, h)
    for r in range(h):
        noisy[r, : w // 2 + jag[r]] = False
        noisy[r, w // 2 + jag[r]:] = True
    holes = rng.rand(h, w) < 0.04
    noisy = noisy ^ holes
    return image, true_mask, noisy


def _iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


@pytest.mark.parametrize("params", [
    DenseCRFParams(),  # reference post-processing parameters
    DenseCRFParams(iters=5, bilateral_sxy=5.0),  # in-training variant
])
def test_conv_dcrf_matches_exact_mean_field(params):
    image, true_mask, noisy = _scene()
    unary = np.asarray(unary_from_masks(
        jnp.asarray(noisy[None]), jnp.ones((1,), bool), params.gt_prob))

    q_exact = exact_mean_field(image, unary, params)
    lab_exact = q_exact.argmax(-1) == 1

    q_ours = np.asarray(dense_crf(jnp.asarray(image), jnp.asarray(unary),
                                  params))
    lab_ours = q_ours.argmax(-1) == 1

    # the test must exercise real refinement: the exact CRF recovers the
    # color edge from the jagged unary (otherwise parity is vacuous)
    assert _iou(lab_exact, true_mask) > _iou(noisy, true_mask)
    assert _iou(lab_exact, true_mask) > 0.95

    # quality parity: refined masks agree (VERDICT r2 asks >= 0.9 IoU)
    assert _iou(lab_ours, lab_exact) >= 0.9
    # and the probabilities correlate strongly
    corr = np.corrcoef(q_ours[..., 1].ravel(), q_exact[..., 1].ravel())[0, 1]
    assert corr > 0.9


def test_grid_dcrf_matches_exact_mean_field():
    params = DenseCRFParams(bilateral_impl="grid")
    image, true_mask, noisy = _scene(seed=1)
    unary = np.asarray(unary_from_masks(
        jnp.asarray(noisy[None]), jnp.ones((1,), bool), params.gt_prob))
    q_exact = exact_mean_field(image, unary, params)
    lab_exact = q_exact.argmax(-1) == 1
    q_ours = np.asarray(dense_crf(jnp.asarray(image), jnp.asarray(unary),
                                  params))
    lab_ours = q_ours.argmax(-1) == 1
    assert _iou(lab_ours, lab_exact) >= 0.9


def test_multilabel_dcrf_matches_exact():
    """3 labels (two parts + background) with distinct colors."""
    params = DenseCRFParams()
    rng = np.random.RandomState(2)
    h = w = 48
    image = np.full((h, w, 3), 30.0, np.float32)
    image[8:40, 4:22] = [200, 60, 60]
    image[8:40, 26:44] = [60, 60, 200]
    image += rng.randn(h, w, 3).astype(np.float32) * 6.0
    image = np.clip(image, 0, 255)
    m1 = np.zeros((h, w), bool)
    m1[10:38, 6:20] = True
    m2 = np.zeros((h, w), bool)
    m2[10:38, 28:42] = True
    # jitter the masks so the CRF has work to do
    m1 = np.roll(m1, 2, axis=1)
    m2 = np.roll(m2, -2, axis=1)
    masks = np.stack([m1, m2])

    unary = np.asarray(unary_from_masks(
        jnp.asarray(masks), jnp.ones((2,), bool), params.gt_prob))
    q_exact = exact_mean_field(image, unary, params)
    q_ours = np.asarray(dense_crf(jnp.asarray(image), jnp.asarray(unary),
                                  params))
    agree = (q_ours.argmax(-1) == q_exact.argmax(-1)).mean()
    assert agree >= 0.95
