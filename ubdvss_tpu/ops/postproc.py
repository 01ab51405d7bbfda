"""Heatmap → rectangles postprocessing, fully on device.

Mirrors the reference's ``postprocessing.py`` (SURVEY.md §1 L8; paper §3.4):
sigmoid(det logits) → threshold (0.5) → connected components → drop tiny
components → min-area rectangle per component → per-rect class = argmax of
the mean class probabilities over the component's pixels → rects scaled by
``cfg.scale`` back to input-image coordinates (call stack SURVEY.md §3.3).

TPU-native differences from the reference (which does all of this on host
with OpenCV/NumPy):
  * everything is static-shaped and jit-compiled: outputs are fixed-size
    arrays of ``cfg.max_components`` slots plus a ``valid`` mask;
  * CCL is the iterative label-propagation kernel (ops/ccl.py);
  * per-component reductions (areas, mean class probs) are one-hot
    einsums that map onto the MXU;
  * min-area rects come from the vectorized hull/calipers pass (ops/rect.py).

``postprocess_batch`` vmaps the whole thing; a batch of images never leaves
the chip between the FCN forward pass and the final rectangle tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ubdvss_tpu.net_config import NetConfig
from ubdvss_tpu.ops.ccl import connected_components
from ubdvss_tpu.ops.rect import min_area_rect_from_mask_stack


def finish_postprocess(logits: jax.Array, labels: jax.Array, cfg: NetConfig) -> dict:
    """Tail of the pipeline given precomputed CC labels (1..N raster order).

    Shared between the single-device path and the spatially-tiled
    distributed path (parallel/tiling.py), which computes labels with a
    halo-exchanged cross-tile CCL before gathering.
    """
    det_prob = jax.nn.sigmoid(logits[..., 0])
    K = cfg.max_components
    eq = labels[..., None] == jnp.arange(1, K + 1, dtype=jnp.int32)
    eqf = eq.astype(jnp.float32)
    areas = jnp.sum(eq, axis=(0, 1), dtype=jnp.int32)  # (K,)
    big_enough = areas >= cfg.min_component_area
    valid = (areas > 0) & big_enough

    safe_area = jnp.maximum(areas, 1).astype(jnp.float32)
    scores = jnp.einsum("hwk,hw->k", eqf, det_prob) / safe_area

    if cfg.classification and logits.shape[-1] > 1:
        cls_prob = jax.nn.softmax(logits[..., 1:], axis=-1)
        mean_cls = jnp.einsum("hwk,hwc->kc", eqf, cls_prob) / safe_area[:, None]
        classes = jnp.argmax(mean_cls, axis=-1).astype(jnp.int32)
        class_probs = mean_cls
    else:
        classes = jnp.zeros((K,), jnp.int32)
        class_probs = jnp.ones((K, 1), jnp.float32)

    rects = min_area_rect_from_mask_stack(eq)
    s = jnp.float32(cfg.scale)
    return {
        "boxes": rects["points"] * s,
        "center": rects["center"] * s,
        "size": rects["size"] * s,
        "angle_deg": rects["angle_deg"],
        "classes": classes,
        "class_probs": class_probs,
        "scores": scores,
        "areas": areas,
        "valid": valid & rects["valid"],
        "num_detections": jnp.sum(valid & rects["valid"]).astype(jnp.int32),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "connectivity"))
def postprocess(logits: jax.Array, cfg: NetConfig, connectivity: int = 8) -> dict:
    """Extract detections from one image's output logits.

    Args:
      logits: (Ho, Wo, 1 + n_classes) f32 — channel 0 detection logit,
        channels 1: classification logits (absent in detection-only mode).
      cfg: NetConfig (static).
    Returns dict (K = cfg.max_components slots):
      boxes: (K, 4, 2) f32 rect corners in input-image coords;
      center/size/angle_deg: rect params (input coords / degrees);
      classes: (K,) int32 argmax class per rect (0 when detection-only);
      scores: (K,) f32 mean detection probability over the component;
      areas: (K,) int32 component pixel count at heatmap resolution;
      valid: (K,) bool slot validity;
      num_detections: () int32.
    """
    det_prob = jax.nn.sigmoid(logits[..., 0])
    mask = det_prob > cfg.detection_threshold
    labels, _ = connected_components(mask, connectivity=connectivity)

    K = cfg.max_components
    # (H, W, K) one-component-per-slice masks; components beyond K dropped.
    eq = labels[..., None] == jnp.arange(1, K + 1, dtype=jnp.int32)
    eqf = eq.astype(jnp.float32)
    areas = jnp.sum(eq, axis=(0, 1), dtype=jnp.int32)  # (K,)
    big_enough = areas >= cfg.min_component_area
    valid = (areas > 0) & big_enough

    safe_area = jnp.maximum(areas, 1).astype(jnp.float32)
    scores = jnp.einsum("hwk,hw->k", eqf, det_prob) / safe_area

    if cfg.classification and logits.shape[-1] > 1:
        cls_prob = jax.nn.softmax(logits[..., 1:], axis=-1)
        mean_cls = jnp.einsum("hwk,hwc->kc", eqf, cls_prob) / safe_area[:, None]
        classes = jnp.argmax(mean_cls, axis=-1).astype(jnp.int32)
        class_probs = mean_cls
    else:
        classes = jnp.zeros((K,), jnp.int32)
        class_probs = jnp.ones((K, 1), jnp.float32)

    rects = min_area_rect_from_mask_stack(eq)
    s = jnp.float32(cfg.scale)
    return {
        "boxes": rects["points"] * s,
        "center": rects["center"] * s,
        "size": rects["size"] * s,
        "angle_deg": rects["angle_deg"],
        "classes": classes,
        "class_probs": class_probs,
        "scores": scores,
        "areas": areas,
        "valid": valid & rects["valid"],
        "num_detections": jnp.sum(valid & rects["valid"]).astype(jnp.int32),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "connectivity"))
def postprocess_batch(logits: jax.Array, cfg: NetConfig, connectivity: int = 8) -> dict:
    """Batched ``postprocess``: logits (B, Ho, Wo, C) → dict with leading B."""
    return jax.vmap(lambda l: postprocess(l, cfg, connectivity))(logits)
