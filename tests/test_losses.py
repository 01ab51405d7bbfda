"""Loss unit tests vs hand-computed values (SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp

from ubdvss_tpu import NetConfig
from ubdvss_tpu.losses import (
    classification_loss_single,
    detection_loss_single,
    sigmoid_bce_from_logits,
    total_loss,
)
from ubdvss_tpu.metrics import pixel_detection_metrics


def _bce(logit, label):
    p = 1 / (1 + np.exp(-logit))
    return -(label * np.log(p) + (1 - label) * np.log(1 - p))


def test_bce_matches_definition():
    logits = np.array([-3.0, -0.5, 0.0, 2.0, 30.0, -30.0])
    labels = np.array([0.0, 1.0, 1.0, 0.0, 1.0, 0.0])
    ours = np.asarray(sigmoid_bce_from_logits(jnp.asarray(logits), jnp.asarray(labels)))
    ref = _bce(logits, labels)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_detection_loss_hard_negative_selection():
    # 2x3 map: 1 positive; ratio 2 -> keep 2 hardest negatives
    logits = np.array([[2.0, -1.0, 0.5], [-3.0, 1.5, -0.2]], np.float32)
    pos = np.zeros((2, 3), bool)
    pos[0, 0] = True
    ours = float(detection_loss_single(jnp.asarray(logits), jnp.asarray(pos), 2.0))
    neg_losses = sorted(
        (_bce(l, 0.0) for l in [-1.0, 0.5, -3.0, 1.5, -0.2]), reverse=True
    )
    expect = (_bce(2.0, 1.0) + neg_losses[0] + neg_losses[1]) / 3.0
    assert abs(ours - expect) < 1e-6


def test_detection_loss_no_positives():
    # no positives -> k = ratio hardest negatives
    logits = np.array([[5.0, -5.0], [-6.0, -7.0]], np.float32)
    pos = np.zeros((2, 2), bool)
    ours = float(detection_loss_single(jnp.asarray(logits), jnp.asarray(pos), 3.0))
    neg = sorted((_bce(l, 0.0) for l in [5.0, -5.0, -6.0, -7.0]), reverse=True)
    expect = sum(neg[:3]) / 3.0
    assert abs(ours - expect) < 1e-6


def test_detection_loss_k_capped_by_available_negatives():
    logits = np.array([[1.0, 2.0]], np.float32)
    pos = np.array([[True, False]])
    ours = float(detection_loss_single(jnp.asarray(logits), jnp.asarray(pos), 5.0))
    expect = (_bce(1.0, 1.0) + _bce(2.0, 0.0)) / 2.0
    assert abs(ours - expect) < 1e-6


def test_classification_loss_masked():
    logits = np.zeros((2, 2, 3), np.float32)
    logits[0, 0] = [5.0, 0.0, 0.0]
    logits[0, 1] = [0.0, 5.0, 0.0]
    segmap = np.array([[1, 2], [0, 0]], np.int32)  # classes 0 and 1; bg ignored
    ours = float(classification_loss_single(jnp.asarray(logits), jnp.asarray(segmap)))
    p = np.exp(5.0) / (np.exp(5.0) + 2)
    expect = -np.log(p)  # both pixels identical by symmetry
    assert abs(ours - expect) < 1e-6
    # all-background: zero, no NaN
    z = float(classification_loss_single(jnp.asarray(logits), jnp.zeros((2, 2), jnp.int32)))
    assert z == 0.0


def test_total_loss_composition():
    cfg = NetConfig(class_names=("a", "b"), hard_negative_ratio=2)
    B, H, W = 2, 4, 4
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 1, (B, H, W, 3)).astype(np.float32)
    segmap = rng.integers(0, 3, (B, H, W)).astype(np.int32)
    loss, aux = total_loss(jnp.asarray(logits), jnp.asarray(segmap), cfg)
    det = np.mean(
        [
            float(
                detection_loss_single(
                    jnp.asarray(logits[i, ..., 0]), jnp.asarray(segmap[i] > 0), 2.0
                )
            )
            for i in range(B)
        ]
    )
    cls = np.mean(
        [
            float(
                classification_loss_single(
                    jnp.asarray(logits[i, ..., 1:]), jnp.asarray(segmap[i])
                )
            )
            for i in range(B)
        ]
    )
    assert abs(float(aux["detection_loss"]) - det) < 1e-6
    assert abs(float(aux["classification_loss"]) - cls) < 1e-6
    assert abs(float(loss) - (det + cls)) < 1e-6
    # detection-only config
    cfg2 = NetConfig(classification=False, hard_negative_ratio=2)
    l2, aux2 = total_loss(jnp.asarray(logits[..., :1]), jnp.asarray(segmap), cfg2)
    assert "classification_loss" not in aux2
    assert abs(float(l2) - det) < 1e-6


def test_pixel_metrics():
    logits = np.array([[10.0, -10.0], [10.0, -10.0]], np.float32)[None]
    segmap = np.array([[1, 0], [0, 2]], np.int32)[None]
    m = {k: float(v) for k, v in pixel_detection_metrics(logits, segmap).items()}
    assert m["pixel_precision"] == 0.5  # tp=1 fp=1
    assert m["pixel_recall"] == 0.5  # fn=1
    assert abs(m["pixel_f1"] - 0.5) < 1e-9
    assert m["pixel_accuracy"] == 0.5


def test_bisect_matches_sort_mining():
    """The sort-free bisection selection must equal the stable-sort top-k
    formulation — random fields, tie-heavy fields (quantized logits give
    many exactly-equal BCE values), no-positive and all-positive images."""
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(5):
        logits = rng.normal(0, 3, (24, 24)).astype(np.float32)
        pos = rng.random((24, 24)) < 0.1
        cases.append((logits, pos))
    # adversarial ties: logits drawn from 4 distinct values
    qlogits = rng.choice(
        np.array([-2.0, -0.5, 0.5, 2.0], np.float32), (24, 24)
    )
    cases.append((qlogits, rng.random((24, 24)) < 0.2))
    cases.append((qlogits, np.zeros((24, 24), bool)))  # no positives
    cases.append((qlogits, np.ones((24, 24), bool)))  # no negatives (k=0)
    for logits, pos in cases:
        a = float(
            detection_loss_single(
                jnp.asarray(logits), jnp.asarray(pos), 3.0, use_sort=True
            )
        )
        b = float(
            detection_loss_single(jnp.asarray(logits), jnp.asarray(pos), 3.0)
        )
        assert abs(a - b) < 1e-5, (a, b)


def test_bisect_gradient_matches_sort():
    """The sort-free top-k must match the stable-sort formulation in
    GRADIENT too, including the k-th boundary element and exact ties
    (regression: the (k - n_gt) * t closed form dropped d/dx of the
    boundary pixel through the bitcast threshold — VERDICT r2 item 5)."""
    import jax

    from ubdvss_tpu.losses import detection_loss_single

    for seed in range(4):
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(size=(12, 12)).astype(np.float32))
        pos = jnp.asarray(rng.random((12, 12)) < 0.15)
        g_sort = jax.grad(
            lambda l: detection_loss_single(l, pos, 3.0, use_sort=True)
        )(logits)
        g_bis = jax.grad(
            lambda l: detection_loss_single(l, pos, 3.0, use_sort=False)
        )(logits)
        np.testing.assert_array_equal(np.asarray(g_sort), np.asarray(g_bis))

    # exact ties at the selection boundary: repeated logit values
    rng = np.random.default_rng(42)
    logits = jnp.asarray(
        np.repeat(rng.normal(size=(9,)), 16).reshape(12, 12).astype(np.float32)
    )
    pos = jnp.zeros((12, 12), bool).at[0, 0].set(True)
    g_sort = jax.grad(
        lambda l: detection_loss_single(l, pos, 3.0, use_sort=True)
    )(logits)
    g_bis = jax.grad(
        lambda l: detection_loss_single(l, pos, 3.0, use_sort=False)
    )(logits)
    np.testing.assert_array_equal(np.asarray(g_sort), np.asarray(g_bis))
