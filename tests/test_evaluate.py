"""Matcher unit tests (SURVEY.md §4.2 "IoU matcher vs brute force")."""

import numpy as np

from ubdvss_tpu.evaluate import evaluate_detections, match_image


def _box(x, y, w, h):
    return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], float)


def test_match_simple_tp_fp_fn():
    gts = [_box(0, 0, 10, 10), _box(50, 50, 10, 10)]
    preds = np.stack([_box(1, 1, 10, 10), _box(100, 100, 5, 5)])
    tp, fp, fn, hits = match_image(
        preds, np.array([0.9, 0.8]), np.array([1, 0]), gts, [1, 2]
    )
    assert (tp, fp, fn, hits) == (1, 1, 1, 1)


def test_match_greedy_score_order():
    # two preds overlap the same GT; higher score wins, other becomes FP
    gts = [_box(0, 0, 10, 10)]
    preds = np.stack([_box(0, 0, 10, 10), _box(1, 1, 10, 10)])
    tp, fp, fn, hits = match_image(
        preds, np.array([0.5, 0.9]), np.array([0, 0]), gts, [0]
    )
    assert (tp, fp, fn) == (1, 1, 0)


def test_match_iou_threshold():
    gts = [_box(0, 0, 10, 10)]
    preds = np.stack([_box(8, 8, 10, 10)])  # IoU = 4/196 < 0.5
    tp, fp, fn, _ = match_image(preds, np.array([1.0]), np.array([0]), gts, [0])
    assert (tp, fp, fn) == (0, 1, 1)


def test_evaluate_aggregation():
    per_image = [
        dict(
            pred_boxes=np.stack([_box(0, 0, 10, 10)]),
            pred_scores=np.array([0.9]),
            pred_classes=np.array([3]),
            gt_polys=[_box(0, 0, 10, 10)],
            gt_classes=[3],
        ),
        dict(
            pred_boxes=np.zeros((0, 4, 2)),
            pred_scores=np.zeros((0,)),
            pred_classes=np.zeros((0,), int),
            gt_polys=[_box(5, 5, 4, 4)],
            gt_classes=[1],
        ),
    ]
    r = evaluate_detections(per_image)
    assert r.tp == 1 and r.fp == 0 and r.fn == 1
    assert r.precision == 1.0 and r.recall == 0.5
    assert r.class_accuracy == 1.0
    assert r.n_images == 2 and r.n_gt == 2 and r.n_pred == 1
    assert "precision" in r.to_json()
