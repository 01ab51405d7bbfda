"""postprocess() vs a host cv2 oracle replicating the reference pipeline
(threshold → connectedComponents → minAreaRect → scale), SURVEY.md §3.3."""

import cv2
import numpy as np
import pytest

from ubdvss_tpu import NetConfig
from ubdvss_tpu.ops.postproc import postprocess, postprocess_batch


def _oracle(logits: np.ndarray, cfg: NetConfig):
    """Reference postprocessing on host (SURVEY.md §1 L8, §3.3)."""
    det = 1.0 / (1.0 + np.exp(-logits[..., 0]))
    mask = (det > cfg.detection_threshold).astype(np.uint8)
    n, lab = cv2.connectedComponents(mask, connectivity=8)
    if logits.shape[-1] > 1:
        cls = logits[..., 1:]
        e = np.exp(cls - cls.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
    else:
        probs = np.ones(logits.shape[:2] + (1,), np.float32)
    out = []
    for k in range(1, n):
        comp = lab == k
        area = int(comp.sum())
        if area < cfg.min_component_area:
            continue
        pts = np.argwhere(comp)[:, ::-1].astype(np.int32)
        rect = cv2.minAreaRect(pts.reshape(-1, 1, 2))
        box = cv2.boxPoints(rect) * cfg.scale
        mean_cls = probs[comp].mean(0)
        out.append(
            dict(
                box=box,
                pts=pts,
                cls=int(mean_cls.argmax()),
                score=float(det[comp].mean()),
                area=area,
            )
        )
    return out


def _blob_logits(cfg, seed=0, H=64, W=64):
    rng = np.random.default_rng(seed)
    logits = np.full((H, W, 1 + cfg.n_classes), -6.0, np.float32)
    logits[..., 1:] = rng.normal(0, 0.1, (H, W, cfg.n_classes))
    yy, xx = np.mgrid[:H, :W]
    for _ in range(5):
        cy, cx = rng.integers(6, H - 6), rng.integers(6, W - 6)
        ry, rx = rng.integers(2, 7, 2)
        ang = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        ry_, rx_ = dy * np.cos(ang) - dx * np.sin(ang), dy * np.sin(ang) + dx * np.cos(ang)
        blob = (ry_ / ry) ** 2 + (rx_ / rx) ** 2 <= 1
        logits[blob, 0] = rng.uniform(2, 8)
        logits[blob, 1 + int(rng.integers(cfg.n_classes))] += 5.0
    return logits


from helpers import assert_rect_parity  # noqa: E402


def _check_box(res_row, oracle_det, cfg):
    assert_rect_parity(
        {"points": res_row["boxes"], "size": res_row["size"]},
        oracle_det["pts"],
        scale=cfg.scale,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_postprocess_matches_oracle(seed):
    cfg = NetConfig(max_components=16, min_component_area=5)
    logits = _blob_logits(cfg, seed)
    res = {k: np.asarray(v) for k, v in postprocess(logits, cfg).items()}
    oracle = _oracle(logits, cfg)
    valid = res["valid"]
    assert int(res["num_detections"]) == len(oracle)
    ours_idx = np.flatnonzero(valid)
    assert len(ours_idx) == len(oracle)
    # both raster-ordered by component first pixel -> compare positionally
    for i, o in zip(ours_idx, oracle):
        _check_box({"boxes": res["boxes"][i], "size": res["size"][i]}, o, cfg)
        assert int(res["classes"][i]) == o["cls"]
        assert abs(float(res["scores"][i]) - o["score"]) < 1e-5
        assert int(res["areas"][i]) == o["area"]


@pytest.mark.slow
def test_min_area_filter_and_batch():
    cfg = NetConfig(max_components=8, min_component_area=50)
    logits = _blob_logits(cfg, 5, H=48, W=48)
    res = postprocess(logits, cfg)
    oracle = _oracle(np.asarray(logits), cfg)
    assert int(res["num_detections"]) == len(oracle)
    # batched version agrees with per-image
    batch = np.stack([logits, _blob_logits(cfg, 6, H=48, W=48)])
    bres = postprocess_batch(batch, cfg)
    r0 = postprocess(batch[0], cfg)
    np.testing.assert_allclose(
        np.asarray(bres["boxes"])[0], np.asarray(r0["boxes"]), atol=1e-5
    )


def test_detection_only():
    cfg = NetConfig(classification=False, max_components=8, min_component_area=5)
    logits = _blob_logits(NetConfig(max_components=8), 7)[..., :1]
    res = postprocess(logits, cfg)
    assert np.all(np.asarray(res["classes"]) == 0)
    assert int(res["num_detections"]) >= 1


@pytest.mark.slow
def test_symmetric_tiebreak_fuzz():
    """Mirror-symmetric blobs tie on area; corners must still match cv2."""
    cfg = NetConfig(max_components=4, min_component_area=1, classification=False)
    rng = np.random.default_rng(11)
    for _ in range(5):
        H = W = 40
        half = rng.random((H // 2, W)) < 0.4
        # keep one big blob: dilate a random walk instead — simpler: ellipse
        cy, cx = 10, int(rng.integers(10, 30))
        ry, rx = int(rng.integers(3, 9)), int(rng.integers(3, 9))
        yy, xx = np.mgrid[: H // 2, :W]
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
        mask = np.concatenate([blob, blob[::-1]], 0)  # mirror symmetric
        logits = np.where(mask, 6.0, -6.0).astype(np.float32)[..., None]
        res = {k: np.asarray(v) for k, v in postprocess(logits, cfg).items()}
        oracle = _oracle(logits, cfg)
        ours_idx = np.flatnonzero(res["valid"])
        assert len(ours_idx) == len(oracle)
        for i, o in zip(ours_idx, oracle):
            _check_box({"boxes": res["boxes"][i], "size": res["size"][i]}, o, cfg)


@pytest.mark.slow
def test_component_overflow_reported():
    """>max_components blobs: slots are cut to K but num_components_total
    reports the true count (VERDICT r1 #7 — no silent truncation)."""
    cfg = NetConfig(max_components=4, min_component_area=1, classification=False)
    H = W = 40
    logits = np.full((H, W, 1), -6.0, np.float32)
    # 9 isolated 3x3 blobs on a grid
    for cy in (2, 15, 28):
        for cx in (2, 15, 28):
            logits[cy : cy + 3, cx : cx + 3, 0] = 6.0
    res = postprocess(logits, cfg)
    assert int(res["num_components_total"]) == 9
    assert int(res["num_detections"]) == 4  # K slots kept
    # fused path agrees (interpreter mode on CPU)
    from ubdvss_tpu.ops.postproc import postprocess_batch_fused

    fres = postprocess_batch_fused(logits[None], cfg, interpret=True)
    assert int(fres["num_components_total"][0]) == 9
    assert int(fres["num_detections"][0]) == 4
    # no overflow: totals agree with detections
    cfg_big = NetConfig(max_components=16, min_component_area=1, classification=False)
    res2 = postprocess(logits, cfg_big)
    assert int(res2["num_components_total"]) == 9
    assert int(res2["num_detections"]) == 9


@pytest.mark.slow
def test_fused_exact_caliper_request_large_heatmap():
    """max_hull_points >= H at H > 128 routes the rect fit through the XLA
    caliper (the uncompacted Mosaic kernel's compile time explodes there);
    results still match the reference path."""
    from ubdvss_tpu.ops.postproc import postprocess_batch, postprocess_batch_fused

    import jax.numpy as jnp

    H, W = 160, 160
    cfg = NetConfig(
        max_components=4, min_component_area=1, classification=False,
        max_hull_points=256,
    )
    logits = np.full((H, W, 1), -6.0, np.float32)
    logits[20:60, 30:90, 0] = 6.0
    logits[100:140, 40:70, 0] = 6.0
    ra = postprocess_batch(jnp.asarray(logits)[None], cfg)
    rb = postprocess_batch_fused(jnp.asarray(logits)[None], cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(ra["valid"]), np.asarray(rb["valid"]))
    np.testing.assert_allclose(
        np.asarray(ra["boxes"]), np.asarray(rb["boxes"]), atol=1e-3
    )
