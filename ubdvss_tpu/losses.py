"""Pixelwise losses with hard-negative mining (paper §3.3; SURVEY.md §2a).

Detection channel: sigmoid binary cross-entropy over all positive (barcode)
pixels plus the k hardest negative pixels per image, k = hard_negative_ratio
× n_positives (ratio ≈ 3:1 neg:pos), normalized by the number of
contributing pixels.  Images with no positives keep k = ratio negatives so
empty pages still push the detector down.

Classification channels: softmax cross-entropy, masked to GT barcode pixels
only (background never contributes), averaged over contributing pixels.

Total = detection_loss_weight * det + classification_loss_weight * cls.

TPU-native notes: the reference's top-k mining (tf.nn.top_k on host-shaped
tensors) becomes a full descending sort of the per-pixel negative losses
inside the jitted step — k is data-dependent, so selection is a rank < k
mask over the sorted losses (static shapes, one XLA sort; `lax.sort` is
stable, giving deterministic tie handling).  Everything lives inside the one
compiled train step (SURVEY.md §2b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ubdvss_tpu.net_config import NetConfig


def sigmoid_bce_from_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable per-element sigmoid cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _top_k_sum_bisect(x: jax.Array, valid: jax.Array, k: jax.Array) -> jax.Array:
    """Sum of the k largest ``x[valid]`` WITHOUT a sort.

    The top-k SUM doesn't need the selection permutation: with t = the k-th
    largest value, sum(top k) = sum over {x > t} plus (k - |{x > t}|)
    elements equal to t (first by flat index — the stable-sort tie order),
    for any tie-breaking rule.  t is found by 31-round bisection on the f32
    BIT PATTERN (monotone for x >= 0), i.e. 31 vectorized count-reductions
    instead of an O(n log^2 n) XLA sort.  Requires x >= 0 (BCE losses are).
    k may be 0 (returns 0).  Selection AND gradient match the stable-sort
    formulation exactly (tests/test_losses.py::test_bisect_matches_sort_mining,
    test_bisect_gradient_matches_sort).
    """
    xb = jnp.where(valid, lax.bitcast_convert_type(x, jnp.int32), -1)

    def body(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // 2  # lo+hi would overflow int32
        ge = jnp.sum(xb >= mid)
        return jnp.where(ge >= k, mid, lo), jnp.where(ge >= k, hi, mid)

    # invariant: count(>= lo) >= k, count(>= hi) < k  (hi = +inf pattern)
    lo, _ = lax.fori_loop(
        0, 31, body, (jnp.int32(0), jnp.int32(0x7F800000))
    )
    t = lax.bitcast_convert_type(lo, jnp.float32)
    gt = valid & (x > t)
    n_gt = jnp.sum(gt)
    # The top-k is completed by (k - n_gt) elements EQUAL to the threshold.
    # Summing them as the actual array elements (first by flat index, the
    # stable-sort tie order) rather than as (k - n_gt) * t keeps the
    # GRADIENT flowing into the boundary pixel(s): t itself comes off an
    # integer bisection (bitcast), so `(k - n_gt) * t` would silently drop
    # d(loss)/d(k-th hardest negative) — caught by the oracle
    # gradient-parity test (tests/test_keras_parity.py, VERDICT r2 item 5).
    eq = valid & (x == t)
    sel = eq & (jnp.cumsum(eq.astype(jnp.int32)) <= k - n_gt)
    s = jnp.sum(jnp.where(gt | sel, x, 0.0))
    return jnp.where(k > 0, s, 0.0)


def detection_loss_single(
    det_logits: jax.Array, pos_mask: jax.Array, ratio: float,
    use_sort: bool = False,
) -> jax.Array:
    """One image: (Ho, Wo) logits + bool positives -> scalar mined BCE.

    ``use_sort`` selects the original stable-sort top-k formulation (kept
    as the reference/oracle); default is the sort-free bisection selection
    (identical sums, see _top_k_sum_bisect)."""
    px = sigmoid_bce_from_logits(det_logits, pos_mask.astype(jnp.float32))
    flat = px.reshape(-1)
    pos = pos_mask.reshape(-1)
    n_pos = jnp.sum(pos)
    pos_sum = jnp.sum(jnp.where(pos, flat, 0.0))
    k = jnp.maximum(n_pos * ratio, ratio).astype(jnp.int32)
    n_neg_avail = flat.shape[0] - n_pos
    k = jnp.minimum(k, n_neg_avail)
    if use_sort:
        # hardest negatives: sort candidate negative losses descending
        neg_losses = jnp.where(pos, -jnp.inf, flat)
        neg_sorted = -jnp.sort(-neg_losses)  # descending, stable
        rank = jnp.arange(flat.shape[0])
        neg_sum = jnp.sum(jnp.where(rank < k, neg_sorted, 0.0))
    else:
        neg_sum = _top_k_sum_bisect(flat, ~pos, k)
    denom = jnp.maximum(n_pos + k, 1).astype(jnp.float32)
    return (pos_sum + neg_sum) / denom


def classification_loss_single(
    cls_logits: jax.Array, segmap: jax.Array
) -> jax.Array:
    """One image: (Ho, Wo, C) logits + int segmap (0 bg, 1+cls) -> scalar CE."""
    mask = segmap > 0
    labels = jnp.maximum(segmap - 1, 0)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    # label lookup as a vectorized one-hot select-sum: take_along_axis
    # lowers to a per-pixel gather that costs ~15.5 ms/step at B=64 512px
    # on v5e (profiled: the single largest op in the train step); the
    # masked sum is exact (selected value + zeros) and fuses away
    sel = labels[..., None] == jnp.arange(cls_logits.shape[-1])
    ll = jnp.sum(jnp.where(sel, logp, 0.0), axis=-1)
    n = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, -ll, 0.0)) / jnp.maximum(n, 1).astype(jnp.float32)


def total_loss(
    logits: jax.Array,
    segmap: jax.Array,
    cfg: NetConfig,
    cls_weight: jax.Array | float | None = None,
):
    """Batched combined loss.

    Args:
      logits: (B, Ho, Wo, 1 + n_classes) model output.
      segmap: (B, Ho, Wo) int32 GT (0 background, 1 + class_index).
      cls_weight: optional (traced) override of
        cfg.classification_loss_weight — the Trainer's cls-weight schedule
        passes the step-dependent value here (the cls head empirically
        needs ~10× detection's schedule; see models/model.py capacity
        notes), keeping the jit cache keyed on static cfg only.
    Returns: (scalar_loss, aux dict).
    """
    pos = segmap > 0
    det = jax.vmap(
        lambda l, p: detection_loss_single(l, p, float(cfg.hard_negative_ratio))
    )(logits[..., 0], pos).mean()
    aux = {"detection_loss": det}
    loss = cfg.detection_loss_weight * det
    if cfg.classification and logits.shape[-1] > 1:
        w = cfg.classification_loss_weight if cls_weight is None else cls_weight
        cls = jax.vmap(classification_loss_single)(logits[..., 1:], segmap).mean()
        aux["classification_loss"] = cls
        loss = loss + w * cls
    aux["loss"] = loss
    return loss, aux
