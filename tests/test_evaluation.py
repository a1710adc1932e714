"""Evaluator tests: AR greedy matching, mIoU math, majority vote, clustering."""

import numpy as np
import pytest

from partdistillation_tpu.evaluation.clustering import ClusteringModule
from partdistillation_tpu.evaluation.miou import (
    MIoUEvaluator,
    MIoUMatcher,
    SupervisedMIoUEvaluator,
    binary_masks_to_semseg,
    confusion_matrix,
    majority_vote,
    miou_from_confusion,
)
from partdistillation_tpu.evaluation.proposal_evaluator import (
    ProposalEvaluator,
    greedy_gt_overlaps,
)


def box_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_greedy_overlaps_perfect_match():
    gt = np.stack([box_mask(10, 10, 0, 5, 0, 10), box_mask(10, 10, 5, 10, 0, 10)])
    props = gt.copy()
    scores = np.array([0.9, 0.8])
    ov = greedy_gt_overlaps(props, scores, gt)
    np.testing.assert_allclose(ov, [1.0, 1.0])


def test_greedy_overlaps_limit_and_order():
    gt = np.stack([box_mask(10, 10, 0, 5, 0, 10)])
    good = box_mask(10, 10, 0, 5, 0, 10)
    bad = box_mask(10, 10, 9, 10, 9, 10)
    # bad proposal has higher score; with limit=1 only bad is considered
    props = np.stack([good, bad])
    scores = np.array([0.1, 0.9])
    ov1 = greedy_gt_overlaps(props, scores, gt, limit=1)
    assert ov1[0] < 0.1
    ov2 = greedy_gt_overlaps(props, scores, gt, limit=2)
    np.testing.assert_allclose(ov2, [1.0])


def test_proposal_evaluator_ar():
    ev = ProposalEvaluator(limits=(1, 10))
    gt = np.stack([box_mask(8, 8, 0, 4, 0, 8), box_mask(8, 8, 4, 8, 0, 8)])
    outputs = {
        "pred_masks": gt[None],  # perfect proposals
        "scores": np.array([[0.9, 0.8]]),
        "valid": np.ones((1, 2), bool),
    }
    ev.process(outputs, gt[None], np.ones((1, 2), bool))
    res = ev.evaluate()
    assert res["AR@10"] == 100.0
    assert res["AR@1"] == 50.0  # only one proposal allowed, 2 GTs


def test_semseg_rasterization_overwrite():
    masks = np.stack([box_mask(4, 4, 0, 4, 0, 4), box_mask(4, 4, 0, 2, 0, 4)])
    semseg = binary_masks_to_semseg(masks, np.array([0, 1]), fill=5)
    assert (semseg[:2] == 1).all() and (semseg[2:] == 0).all()


def test_confusion_and_miou_hand_case():
    # 2 classes; pred == gt on class 0 (8 px), class 1 half right (4/8)
    pd = np.array([[0] * 8 + [1] * 8]).reshape(4, 4)
    gt = np.array([[0] * 8 + [1] * 4 + [0] * 4]).reshape(4, 4)
    conf = confusion_matrix(pd, gt, 2)
    assert conf[0, 0] == 8 and conf[1, 1] == 4 and conf[1, 0] == 4
    r = miou_from_confusion(conf)
    # class0: tp=8, gt=12, pred=8 -> iou 8/12; class1: tp=4, gt=4, pred=8 -> 4/8
    np.testing.assert_allclose(r["per_class_iou"][0], 100 * 8 / 12)
    np.testing.assert_allclose(r["per_class_iou"][1], 100 * 0.5)
    np.testing.assert_allclose(r["mIoU"], 100 * (8 / 12 + 0.5) / 2)


def test_majority_vote():
    conf = np.zeros((4, 4))
    conf[0, 2] = 10
    conf[1, 0] = 3
    conf[1, 1] = 7
    vote = majority_vote(conf, pred_classes=2, gt_classes=3)
    np.testing.assert_array_equal(vote, [2, 1])


def test_matcher_and_evaluator_pipeline():
    h = w = 8
    gt_masks = np.stack([box_mask(h, w, 0, 4, 0, 8), box_mask(h, w, 4, 8, 0, 8)])
    gt_labels = np.array([0, 1])
    # predictions use cluster ids 1,0 (swapped) — vote should unswap them
    outputs = {
        "pred_masks": gt_masks[None],
        "pred_labels": np.array([[1, 0]]),
        "valid": np.ones((1, 2), bool),
    }
    matcher = MIoUMatcher(pred_classes=2, gt_classes=2)
    matcher.process(outputs, gt_masks[None], gt_labels[None], np.ones((1, 2), bool),
                    np.array([7]))
    mapping = matcher.evaluate()
    np.testing.assert_array_equal(mapping[7], [1, 0])

    # apply mapping -> perfect predictions -> mIoU 100
    ev = MIoUEvaluator(gt_classes=2)
    mapped = {
        "pred_masks": outputs["pred_masks"],
        "pred_labels": mapping[7][outputs["pred_labels"]],
        "valid": outputs["valid"],
    }
    ev.process(mapped, gt_masks[None], gt_labels[None], np.ones((1, 2), bool), np.array([7]))
    res = ev.evaluate()
    np.testing.assert_allclose(res["C-mIoU"], 100.0)
    np.testing.assert_allclose(res["A-mIoU"], 100.0)


def test_supervised_evaluator_single_confusion():
    ev = SupervisedMIoUEvaluator(gt_classes=2)
    gt = np.stack([box_mask(4, 4, 0, 2, 0, 4)])
    out = {"pred_masks": gt[None], "pred_labels": np.array([[0]]),
           "valid": np.ones((1, 1), bool)}
    ev.process(out, gt[None], np.array([[0]]), np.ones((1, 1), bool), np.array([3]))
    ev.process(out, gt[None], np.array([[0]]), np.ones((1, 1), bool), np.array([9]))
    assert len(ev._acc.conf) == 1  # both object classes share one matrix


def test_clustering_module_recovers_structure():
    rng = np.random.RandomState(0)
    num_classes, d, k = 3, 8, 2
    cm = ClusteringModule(num_object_classes=num_classes, feat_dim=d, num_clusters=k,
                          capacity_per_class=128)
    centers = {c: rng.randn(k, d) * 10 for c in range(num_classes)}
    for step in range(20):
        c = step % num_classes
        which = rng.randint(0, k, 4)
        feats = centers[c][which] + rng.randn(4, d) * 0.05
        cm.process({"feats": feats[None], "valid": np.ones((1, 4), bool)}, np.array([c]))
    bank = cm.evaluate()
    assert bank.shape == (num_classes, k, d)
    for c in range(num_classes):
        # each true center has a nearby centroid
        d2 = ((bank[c][:, None] - centers[c][None]) ** 2).sum(-1)
        assert d2.min(axis=0).max() < 1.0


def test_clustering_module_few_samples_random():
    cm = ClusteringModule(num_object_classes=2, feat_dim=4, num_clusters=3,
                          capacity_per_class=16)
    cm.process({"feats": np.ones((1, 2, 4), np.float32),
                "valid": np.ones((1, 2), bool)}, np.array([0]))
    bank = cm.evaluate()
    assert np.isfinite(bank).all()


def test_clustering_reservoir_not_first_n_biased():
    """Over-capacity streams keep a spread sample, not the first-N prefix
    (the round-1 'keep first N' early-image bias, fixed via algorithm R)."""
    cap, d = 32, 2
    cm = ClusteringModule(num_object_classes=1, feat_dim=d, num_clusters=2,
                          capacity_per_class=cap)
    for i in range(8):  # 8 batches x 16 feats = 128 >> cap
        feats = np.full((1, 16, d), float(i), np.float32)
        cm.process({"feats": feats, "valid": np.ones((1, 16), bool)}, np.array([0]))
    buf = cm._feats[0]
    assert cm._seen[0] == 128
    batches_present = np.unique(buf[:, 0].astype(int))
    # a first-N cap would store only batches 0 and 1
    assert len(batches_present) >= 4
    assert batches_present.max() >= 4


def test_merge_reservoirs_proportional():
    from partdistillation_tpu.evaluation.clustering import merge_reservoirs

    cap, d = 16, 2
    # host A saw 300 rows of value 1, host B 100 rows of value 2
    fa = {0: np.ones((cap, d), np.float32)}
    fb = {0: np.full((cap, d), 2.0, np.float32), 5: np.full((cap, d), 7.0, np.float32)}
    feats, seen = merge_reservoirs([(fa, {0: 300}), (fb, {0: 100, 5: 8})], cap)
    assert seen == {0: 400, 5: 8}
    vals = feats[0][:, 0]
    n_a, n_b = int((vals == 1).sum()), int((vals == 2).sum())
    assert n_a + n_b == cap
    assert n_a > n_b  # proportional to seen counts (300 vs 100)
    # under-capacity class passes through intact
    assert (feats[5][:8] == 7.0).all()


def test_merge_confusion_dicts():
    from partdistillation_tpu.evaluation.miou import merge_confusion_dicts

    a = {1: np.eye(3), 2: np.ones((3, 3))}
    b = {2: np.ones((3, 3)), 7: np.eye(3) * 2}
    m = merge_confusion_dicts([a, b])
    assert set(m) == {1, 2, 7}
    np.testing.assert_array_equal(m[2], 2 * np.ones((3, 3)))
    np.testing.assert_array_equal(m[1], np.eye(3))


def test_all_gather_objects_single_process():
    from partdistillation_tpu.engine.launch import all_gather_objects

    obj = {"ragged": [np.zeros((2, 3)), np.ones((5,))], "n": 7}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0]["n"] == 7
