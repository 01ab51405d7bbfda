"""TensorFlow oracle for the mined training losses (SURVEY.md §4.1).

Independent re-implementation of the reference's loss semantics (paper §3.3;
SURVEY.md §2a "Losses") in TF ops — sigmoid BCE over positives + the k
hardest negatives (k = hard_negative_ratio × n_pos, floor ratio, capped by
the negatives available), and softmax CE masked to GT barcode pixels — so
the JAX losses can be checked for VALUE and GRADIENT parity against a
different stack (TF CPU kernels vs XLA), the way the heatmap parity test
already checks the model forward.  Written from the survey, not from
ubdvss_tpu.losses: top-k selection here is an explicit descending sort,
the formulation the reference's tf.nn.top_k mining corresponds to.
"""

import os

os.environ.setdefault("KERAS_BACKEND", "tensorflow")

from ubdvss_tpu.net_config import NetConfig  # noqa: E402


def tf_total_loss(logits, segmap, cfg: NetConfig):
    """(B, Ho, Wo, 1+C) f32 logits + (B, Ho, Wo) int32 segmap -> scalar.

    Mirrors ubdvss_tpu.losses.total_loss semantics exactly (same per-image
    normalization, same k law, same loss mix).
    """
    import tensorflow as tf

    det = logits[..., 0]
    pos = segmap > 0
    pos_f = tf.cast(pos, tf.float32)
    px = tf.nn.sigmoid_cross_entropy_with_logits(labels=pos_f, logits=det)
    b = tf.shape(px)[0]
    flat = tf.reshape(px, (b, -1))
    posf = tf.reshape(pos_f, (b, -1))
    n_pix = tf.shape(flat)[1]
    n_pos = tf.cast(tf.reduce_sum(posf, axis=1), tf.int32)
    ratio = int(cfg.hard_negative_ratio)
    k = tf.maximum(n_pos * ratio, ratio)
    k = tf.minimum(k, n_pix - n_pos)
    # hardest negatives: descending sort of negative-pixel losses, keep
    # rank < k (the reference's tf.nn.top_k mining)
    neg = tf.where(posf > 0, tf.fill(tf.shape(flat), float("-inf")), flat)
    neg_sorted = tf.sort(neg, axis=1, direction="DESCENDING")
    rank = tf.range(n_pix)
    keep = rank[None, :] < k[:, None]
    neg_sum = tf.reduce_sum(
        tf.where(keep, neg_sorted, tf.zeros_like(neg_sorted)), axis=1
    )
    pos_sum = tf.reduce_sum(flat * posf, axis=1)
    denom = tf.cast(tf.maximum(n_pos + k, 1), tf.float32)
    det_loss = tf.reduce_mean((pos_sum + neg_sum) / denom)

    total = cfg.detection_loss_weight * det_loss
    aux = {"detection_loss": det_loss}
    if cfg.classification and logits.shape[-1] > 1:
        labels = tf.maximum(segmap - 1, 0)
        ce = tf.nn.sparse_softmax_cross_entropy_with_logits(
            labels=labels, logits=logits[..., 1:]
        )
        mask = tf.cast(pos, tf.float32)
        n = tf.reduce_sum(mask, axis=(1, 2))
        per_img = tf.reduce_sum(ce * mask, axis=(1, 2)) / tf.maximum(n, 1.0)
        cls_loss = tf.reduce_mean(per_img)
        aux["classification_loss"] = cls_loss
        total = total + cfg.classification_loss_weight * cls_loss
    aux["loss"] = total
    return total, aux
