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

from ubdvss_tpu.net_config import NetConfig


def sigmoid_bce_from_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable per-element sigmoid cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def detection_loss_single(
    det_logits: jax.Array, pos_mask: jax.Array, ratio: float
) -> jax.Array:
    """One image: (Ho, Wo) logits + bool positives -> scalar mined BCE."""
    px = sigmoid_bce_from_logits(det_logits, pos_mask.astype(jnp.float32))
    flat = px.reshape(-1)
    pos = pos_mask.reshape(-1)
    n_pos = jnp.sum(pos)
    pos_sum = jnp.sum(jnp.where(pos, flat, 0.0))
    # hardest negatives: sort candidate negative losses descending
    neg_losses = jnp.where(pos, -jnp.inf, flat)
    neg_sorted = -jnp.sort(-neg_losses)  # descending, stable
    k = jnp.maximum(n_pos * ratio, ratio).astype(jnp.int32)
    n_neg_avail = flat.shape[0] - n_pos
    k = jnp.minimum(k, n_neg_avail)
    rank = jnp.arange(flat.shape[0])
    neg_sum = jnp.sum(jnp.where(rank < k, neg_sorted, 0.0))
    denom = jnp.maximum(n_pos + k, 1).astype(jnp.float32)
    return (pos_sum + neg_sum) / denom


def classification_loss_single(
    cls_logits: jax.Array, segmap: jax.Array
) -> jax.Array:
    """One image: (Ho, Wo, C) logits + int segmap (0 bg, 1+cls) -> scalar CE."""
    mask = segmap > 0
    labels = jnp.maximum(segmap - 1, 0)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    n = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, -ll, 0.0)) / jnp.maximum(n, 1).astype(jnp.float32)


def total_loss(logits: jax.Array, segmap: jax.Array, cfg: NetConfig):
    """Batched combined loss.

    Args:
      logits: (B, Ho, Wo, 1 + n_classes) model output.
      segmap: (B, Ho, Wo) int32 GT (0 background, 1 + class_index).
    Returns: (scalar_loss, aux dict).
    """
    pos = segmap > 0
    det = jax.vmap(
        lambda l, p: detection_loss_single(l, p, float(cfg.hard_negative_ratio))
    )(logits[..., 0], pos).mean()
    aux = {"detection_loss": det}
    loss = cfg.detection_loss_weight * det
    if cfg.classification and logits.shape[-1] > 1:
        cls = jax.vmap(classification_loss_single)(logits[..., 1:], segmap).mean()
        aux["classification_loss"] = cls
        loss = loss + cfg.classification_loss_weight * cls
    aux["loss"] = loss
    return loss, aux
