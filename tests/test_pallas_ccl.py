"""Pallas CCL kernel parity vs the XLA scan path (interpreter mode on CPU;
the same kernel compiles natively on TPU — SURVEY.md §5 race detection:
pallas interpreter + reference kernel cross-check)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ubdvss_tpu import NetConfig
from ubdvss_tpu.ops.ccl import label_propagation
from ubdvss_tpu.ops.pallas.ccl_kernel import ccl_labels_from_logits
from ubdvss_tpu.ops.postproc import (
    postprocess_batch,
    postprocess_batch_fused,
    roots_from_raw_labels,
)


def _blob_logits(seed, B=2, H=32, W=32, C=5):
    rng = np.random.default_rng(seed)
    logits = np.full((B, H, W, C), -6, np.float32)
    for b in range(B):
        for _ in range(3):
            cy, cx = rng.integers(2, H - 10, 2)
            h, w = rng.integers(3, 9, 2)
            logits[b, cy : cy + h, cx : cx + w, 0] = 6
            logits[b, cy : cy + h, cx : cx + w, 1 + int(rng.integers(C - 1))] = 5
    return jnp.asarray(logits)


@pytest.mark.parametrize("connectivity", [4, 8])
def test_kernel_labels_match_xla(connectivity):
    logits = _blob_logits(0)
    lab_p = ccl_labels_from_logits(
        logits[..., 0], connectivity=connectivity, interpret=True
    )
    mask = jax.nn.sigmoid(logits[..., 0]) > 0.5
    lab_x = jax.vmap(lambda m: label_propagation(m, connectivity))(mask)
    np.testing.assert_array_equal(np.asarray(lab_p), np.asarray(lab_x))


@pytest.mark.slow
def test_kernel_adversarial_masks():
    # spiral-ish snake + checkerboard via logit patterns
    H = W = 32
    snake = np.full((H, W), -6, np.float32)
    for c in range(0, W, 4):
        snake[:, c] = 6
        snake[0 if (c // 4) % 2 else H - 1, c : min(c + 5, W)] = 6
    checker = np.where((np.indices((H, W)).sum(0) % 2) == 0, 6.0, -6.0).astype(
        np.float32
    )
    logits = jnp.asarray(np.stack([snake, checker]))
    lab_p = ccl_labels_from_logits(logits, interpret=True)
    lab_x = jax.vmap(lambda m: label_propagation(m))(
        jax.nn.sigmoid(logits) > 0.5
    )
    np.testing.assert_array_equal(np.asarray(lab_p), np.asarray(lab_x))


def test_roots_ordering_matches_compaction():
    logits = _blob_logits(1)
    raw = ccl_labels_from_logits(logits[..., 0], interpret=True)
    rootvals, valid = roots_from_raw_labels(raw, 8)
    rootvals, valid = np.asarray(rootvals), np.asarray(valid)
    # ascending order, valid prefix
    for b in range(rootvals.shape[0]):
        v = rootvals[b][valid[b]]
        assert np.all(np.diff(v) > 0)
        assert np.all(~valid[b][len(v) :])


@pytest.mark.slow
def test_fused_postprocess_matches_reference_path():
    cfg = NetConfig(
        class_names=("a", "b", "c", "d"), max_components=8, min_component_area=3
    )
    logits = _blob_logits(2)
    rf = jax.device_get(postprocess_batch_fused(logits, cfg, interpret=True))
    rx = jax.device_get(postprocess_batch(logits, cfg))
    np.testing.assert_array_equal(rf["valid"], rx["valid"])
    np.testing.assert_array_equal(rf["areas"], rx["areas"])
    np.testing.assert_array_equal(rf["classes"], rx["classes"])
    np.testing.assert_allclose(rf["scores"], rx["scores"], atol=1e-6)
    np.testing.assert_allclose(rf["boxes"], rx["boxes"], atol=1e-4)
    np.testing.assert_array_equal(rf["num_detections"], rx["num_detections"])


@pytest.mark.slow
def test_fused_postprocess_packed_phases_matches():
    """packed_phases=(2, 2): space-to-depth-packed logits (the s2d context
    route's native layout) must yield the same detections as unpacked —
    the geometry kernel sees the same det map, and the per-component sums
    are pixel-order invariant."""
    from ubdvss_tpu.ops.pallas.context_kernel import _s2d

    cfg = NetConfig(
        class_names=("a", "b", "c", "d"), max_components=8, min_component_area=3
    )
    logits = _blob_logits(5)
    packed = _s2d(logits)
    rf = jax.device_get(postprocess_batch_fused(logits, cfg, interpret=True))
    rp = jax.device_get(
        postprocess_batch_fused(packed, cfg, interpret=True, packed_phases=(2, 2))
    )
    np.testing.assert_array_equal(rp["valid"], rf["valid"])
    np.testing.assert_array_equal(rp["areas"], rf["areas"])
    np.testing.assert_array_equal(rp["classes"], rf["classes"])
    np.testing.assert_allclose(rp["scores"], rf["scores"], atol=1e-6)
    np.testing.assert_allclose(rp["class_probs"], rf["class_probs"], atol=1e-6)
    np.testing.assert_allclose(rp["boxes"], rf["boxes"], atol=1e-4)
    np.testing.assert_array_equal(rp["num_detections"], rf["num_detections"])
    np.testing.assert_array_equal(
        rp["num_components_total"], rf["num_components_total"]
    )


def test_grouped_stacking_isolates_images():
    """component_slots_from_logits stacks G images per CCL program
    (postproc_kernel._stack_group); blobs touching the bottom edge of one
    image and the top edge of the next must NOT merge across the stacking
    seam, and labels must equal the per-image XLA reference."""
    from ubdvss_tpu.ops.pallas.postproc_kernel import (
        _stack_group,
        component_slots_from_logits,
    )

    H = W = 16
    B = 8
    logits = np.full((B, H, W), -6, np.float32)
    # full-height vertical bar in every image: touches rows 0 and H-1
    logits[:, :, 4:7] = 6
    # plus a bottom-edge blob in even images / top-edge blob in odd ones
    logits[0::2, H - 3 :, 10:14] = 6
    logits[1::2, :3, 10:14] = 6
    lg = jnp.asarray(logits)
    G, gap = _stack_group(lg)
    assert G > 1, "stacking must engage for this shape"
    out = jax.device_get(component_slots_from_logits(lg, 8, interpret=True))
    # every image sees exactly its own 2 components
    np.testing.assert_array_equal(out["num_components_total"], np.full(B, 2))
    # per-image labels identical to the unstacked XLA reference
    mask = jax.nn.sigmoid(lg) > 0.5
    lab_x = np.asarray(jax.vmap(lambda m: label_propagation(m))(mask))
    for b in range(B):
        for k in range(2):
            m = np.asarray(out["slots"][b]) == k
            assert m.any()
            assert len(np.unique(lab_x[b][m])) == 1
    # rootvals are per-image raster-min indices (rebased, not stacked);
    # padding slots hold exactly the per-image sentinel H*W
    rv = out["rootvals"]
    assert np.all((rv < H * W) | (rv == H * W))
    assert np.all(rv[:, :2] < H * W) and np.all(rv[:, 2:] == H * W)


@pytest.mark.slow
@pytest.mark.tpu
def test_kernel_native_tpu():
    logits = _blob_logits(3, H=64, W=64)
    lab_p = ccl_labels_from_logits(logits[..., 0])
    mask = jax.nn.sigmoid(logits[..., 0]) > 0.5
    lab_x = jax.jit(jax.vmap(lambda m: label_propagation(m)))(mask)
    np.testing.assert_array_equal(np.asarray(lab_p), np.asarray(lab_x))
