"""Pixel-level training metrics (SURVEY.md §1 L6, §2a "Train metrics").

Precision/recall/F1 of the thresholded detection channel against the GT
segmap, for progress monitoring during training (the object-level metrics
live in evaluate.py).  Pure jnp; runs inside the jitted train/eval step.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_detection_metrics(
    det_logits: jnp.ndarray, segmap: jnp.ndarray, threshold: float = 0.5
) -> dict:
    """(B, Ho, Wo) logits + int GT map -> dict of scalar P/R/F1/accuracy."""
    pred = jnp.asarray(det_logits > jnp.log(threshold / (1.0 - threshold)))
    gt = segmap > 0
    tp = jnp.sum(pred & gt)
    fp = jnp.sum(pred & ~gt)
    fn = jnp.sum(~pred & gt)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    accuracy = jnp.mean(pred == gt)
    return {
        "pixel_precision": precision,
        "pixel_recall": recall,
        "pixel_f1": f1,
        "pixel_accuracy": accuracy,
    }
