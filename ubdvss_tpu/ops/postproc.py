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


def roots_from_raw_labels(raw_lab: jax.Array, max_components: int) -> tuple[jax.Array, jax.Array]:
    """Raw min-index labels (..., H, W) -> per-image root values + validity.

    Roots are each component's minimum linear pixel index; taking the K
    smallest (via top_k, no gathers — XLA lowers big gathers poorly on TPU)
    reproduces the raster-scan component ordering of compacted labels.
    """
    H, W = raw_lab.shape[-2], raw_lab.shape[-1]
    sentinel = H * W
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    is_root = raw_lab == lin
    cand = jnp.where(is_root & (raw_lab < sentinel), raw_lab, sentinel)
    neg_top, _ = jax.lax.top_k(-cand.reshape(*raw_lab.shape[:-2], H * W), max_components)
    rootvals = -neg_top  # ascending = raster order
    return rootvals, rootvals < sentinel


def eq_from_raw_labels(raw_lab: jax.Array, rootvals: jax.Array, root_valid: jax.Array) -> jax.Array:
    """One-component-per-slice masks (..., H, W, K) from raw labels."""
    eq = raw_lab[..., None] == rootvals[..., None, None, :]
    return eq & root_valid[..., None, None, :]


def finish_from_eq(
    logits: jax.Array,
    eq: jax.Array,
    cfg: NetConfig,
    num_components_total: jax.Array | None = None,
) -> dict:
    """Tail of the pipeline given per-component masks eq (Ho, Wo, K).

    ``num_components_total`` is the true component count BEFORE the
    cfg.max_components top-K cut (overflow indicator — VERDICT r1 #7:
    silently missing boxes violate the "boxes come off the chip" contract);
    when None it falls back to the number of occupied slots.
    """
    det_prob = jax.nn.sigmoid(logits[..., 0])
    K = cfg.max_components
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
    if num_components_total is None:
        num_components_total = jnp.sum(areas > 0).astype(jnp.int32)
    return {
        "num_components_total": num_components_total,
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


def finish_postprocess(logits: jax.Array, labels: jax.Array, cfg: NetConfig) -> dict:
    """Tail of the pipeline given precomputed COMPACT labels (1..N raster).

    Shared with the spatially-tiled distributed path (parallel/tiling.py).
    """
    K = cfg.max_components
    eq = labels[..., None] == jnp.arange(1, K + 1, dtype=jnp.int32)
    # compact labels are 1..N raster-ordered, so max IS the true total —
    # components beyond slot K are reported even though their boxes are cut
    return finish_from_eq(
        logits, eq, cfg, num_components_total=jnp.max(labels).astype(jnp.int32)
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "connectivity", "interpret", "packed_phases"),
)
def postprocess_batch_fused(
    logits: jax.Array,
    cfg: NetConfig,
    connectivity: int = 8,
    interpret: bool = False,
    packed_phases: tuple[int, int] | None = None,
) -> dict:
    """Fast batched path: the Pallas postprocessing mega-kernel
    (threshold → CCL → roots → per-component stats in VMEM, see
    ops/pallas/postproc_kernel.py) + the vectorized rect fit on the compact
    per-row extremes.

    Semantically identical to ``postprocess_batch`` (asserted in
    tests/test_pallas_ccl.py); ``interpret`` runs the kernel in the Pallas
    interpreter for CPU use.  ``packed_phases=(py, px)``: logits arrive
    space-to-depth packed (B, Ho/py, Wo/px, py*px*C) phase-major straight
    from the s2d context route — see component_stats_from_logits.
    """
    from ubdvss_tpu.ops.pallas.postproc_kernel import component_stats_from_logits

    if packed_phases is None:
        Ho, Wo, C = logits.shape[1], logits.shape[2], logits.shape[3]
    else:
        py, px = packed_phases
        Ho, Wo = logits.shape[1] * py, logits.shape[2] * px
        C = logits.shape[3] // (py * px)
    K = cfg.max_components
    stats = component_stats_from_logits(
        logits,
        max_components=K,
        threshold=cfg.detection_threshold,
        connectivity=connectivity,
        interpret=interpret,
        packed_phases=packed_phases,
    )
    root_valid = stats["rootvals"] < Ho * Wo  # (B, K)
    # padded root slots (rootvals == sentinel) matched background pixels in
    # the kernel's one-hot — zero them out here
    # areas come from an exact one-hot matmul: integers below 2^24
    areas = jnp.where(root_valid, jnp.round(stats["areas"]).astype(jnp.int32), 0)
    valid = root_valid & (areas >= cfg.min_component_area)
    safe_area = jnp.maximum(areas, 1).astype(jnp.float32)
    scores = jnp.where(root_valid, stats["det_sums"], 0.0) / safe_area
    if cfg.classification and C > 1:
        class_probs = (
            jnp.where(root_valid[..., None], stats["cls_sums"], 0.0)
            / safe_area[..., None]
        )
        classes = jnp.argmax(class_probs, axis=-1).astype(jnp.int32)
    else:
        classes = jnp.zeros((logits.shape[0], K), jnp.int32)
        class_probs = jnp.ones((logits.shape[0], K, 1), jnp.float32)

    from ubdvss_tpu.ops.pallas.rect_kernel import (
        min_area_rect_select,
        rects_from_selection,
    )

    # rect fit inside a second VMEM kernel.  The hull-compacted variant
    # (max_points = cfg.max_hull_points) keeps the caliper projections at a
    # fixed (2M, 2M) regardless of heatmap height, so it serves every scan
    # size (H=512 extremes from 2048px scans: ~free vs ~28 ms/batch for the
    # XLA compact caliper at B=16).  max_points >= H falls back to the
    # uncompacted exact kernel inside min_area_rect_select.
    Hx = stats["minx"].shape[-1]
    if cfg.max_hull_points < Hx or Hx <= 128:
        sel = min_area_rect_select(
            stats["minx"],
            stats["maxx"],
            interpret=interpret,
            max_points=cfg.max_hull_points,
        )
        rects = rects_from_selection(sel)
    else:
        # max_hull_points >= H asks for the uncompacted caliper; at H > 128
        # the exact Mosaic kernel's compile time explodes (dirs scale with
        # H), so serve exactness through the XLA formulation instead
        from ubdvss_tpu.ops.rect import min_area_rect_from_extremes_compact

        rects = min_area_rect_from_extremes_compact(
            stats["minx"], stats["maxx"], stats["maxx"] >= 0, Hx
        )
    # padded root slots matched the background in the kernel — zero their
    # rect outputs (matches the reference path's empty-component rects)
    rv = root_valid
    rects = {
        "points": jnp.where(rv[..., None, None], rects["points"], 0.0),
        "center": jnp.where(rv[..., None], rects["center"], 0.0),
        "size": jnp.where(rv[..., None], rects["size"], 0.0),
        "angle_deg": jnp.where(rv, rects["angle_deg"], 0.0),
    }
    rect_valid = jnp.any(stats["maxx"] >= 0, axis=-1) & root_valid
    s = jnp.float32(cfg.scale)
    final_valid = valid & rect_valid
    return {
        "boxes": rects["points"] * s,
        "center": rects["center"] * s,
        "size": rects["size"] * s,
        "angle_deg": rects["angle_deg"],
        "classes": classes,
        "class_probs": class_probs,
        "scores": scores,
        "areas": areas,
        "valid": final_valid,
        "num_detections": jnp.sum(final_valid, axis=-1).astype(jnp.int32),
        "num_components_total": stats["num_components_total"],
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
    return finish_postprocess(logits, labels, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "connectivity"))
def postprocess_batch(logits: jax.Array, cfg: NetConfig, connectivity: int = 8) -> dict:
    """Batched ``postprocess``: logits (B, Ho, Wo, C) → dict with leading B."""
    return jax.vmap(lambda l: postprocess(l, cfg, connectivity))(logits)
