"""Hull + min-area rect vs cv2.convexHull / cv2.minAreaRect (SURVEY.md §4.2)."""

import cv2
import numpy as np
import pytest

from ubdvss_tpu.ops.rect import (
    min_area_rect,
    min_area_rect_from_mask_stack,
    monotone_chain_hull,
)


def _hull_set(pts):
    h = cv2.convexHull(pts.astype(np.int32).reshape(-1, 1, 2))
    return {tuple(p) for p in h.reshape(-1, 2)}


def _pad(pts, n_slots):
    n = len(pts)
    out = np.zeros((n_slots, 2), np.int32)
    out[:n] = pts
    valid = np.zeros(n_slots, bool)
    valid[:n] = True
    return out, valid


from helpers import assert_rect_parity as _assert_rect_matches  # noqa: E402


@pytest.mark.slow
def test_hull_random_points():
    rng = np.random.default_rng(0)
    for trial in range(10):
        n = int(rng.integers(1, 60))
        pts = rng.integers(0, 50, (n, 2)).astype(np.int32)
        padded, valid = _pad(pts, 64)
        hull, m = monotone_chain_hull(padded, valid)
        hull, m = np.asarray(hull), int(m)
        ours = {tuple(p) for p in hull[:m]}
        theirs = _hull_set(pts)
        # cv2 may keep collinear points depending on version; require ours to be
        # the vertex set of the same polygon: every our point in cv2 hull set OR
        # compare via equal hull area + containment.
        assert ours <= theirs or _poly_area(hull[:m]) == _poly_area(
            np.array(sorted(theirs, key=lambda q: np.arctan2(*q)))
        )
        # all input points inside our hull
        if m >= 3:
            poly = hull[:m].astype(np.float32)
            for p in pts:
                d = cv2.pointPolygonTest(poly.reshape(-1, 1, 2), tuple(map(float, p)), True)
                assert d >= -1e-3


def _poly_area(p):
    if len(p) < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def test_hull_degenerate():
    # empty
    padded, valid = _pad(np.zeros((0, 2)), 16)
    hull, m = monotone_chain_hull(padded, valid)
    assert int(m) == 0
    # single point (duplicated)
    padded, valid = _pad(np.array([[3, 4], [3, 4], [3, 4]]), 16)
    hull, m = monotone_chain_hull(padded, valid)
    assert int(m) == 1 and tuple(np.asarray(hull)[0]) == (3, 4)
    # collinear
    padded, valid = _pad(np.array([[0, 0], [2, 2], [5, 5], [3, 3]]), 16)
    hull, m = monotone_chain_hull(padded, valid)
    hull, m = np.asarray(hull), int(m)
    assert m == 2 and {tuple(p) for p in hull[:m]} == {(0, 0), (5, 5)}


@pytest.mark.slow
def test_min_area_rect_vs_cv2_random():
    rng = np.random.default_rng(1)
    for trial in range(15):
        n = int(rng.integers(3, 80))
        pts = rng.integers(0, 100, (n, 2)).astype(np.int32)
        if len(np.unique(pts, axis=0)) < 3:
            continue
        padded, valid = _pad(pts, 128)
        hull, m = monotone_chain_hull(padded, valid)
        res = min_area_rect(hull, m)
        _assert_rect_matches(res, pts)


def test_min_area_rect_axis_aligned():
    pts = np.array([[10, 20], [30, 20], [30, 25], [10, 25]], np.int32)
    padded, valid = _pad(pts, 16)
    hull, m = monotone_chain_hull(padded, valid)
    res = min_area_rect(hull, m)
    assert abs(float(res["size"].min()) - 5) < 1e-4
    assert abs(float(res["size"].max()) - 20) < 1e-4
    np.testing.assert_allclose(np.asarray(res["center"]), [20, 22.5], atol=1e-4)


@pytest.mark.slow
def test_min_area_rect_rotated_invariance():
    """Rect of 90°-rotated points == rotated rect (SURVEY.md §4.3 property)."""
    rng = np.random.default_rng(2)
    pts = rng.integers(0, 60, (20, 2)).astype(np.int32)
    padded, valid = _pad(pts, 64)
    hull, m = monotone_chain_hull(padded, valid)
    a0 = np.prod(np.asarray(min_area_rect(hull, m)["size"]))
    rot = np.stack([pts[:, 1], -pts[:, 0] + 60], axis=1)
    padded, valid = _pad(rot, 64)
    hull, m = monotone_chain_hull(padded, valid)
    a1 = np.prod(np.asarray(min_area_rect(hull, m)["size"]))
    assert abs(a0 - a1) < 1e-2


@pytest.mark.slow
def test_mask_stack_rects_vs_cv2():
    """Blob masks → rects must match cv2.minAreaRect over the pixel coords."""
    rng = np.random.default_rng(3)
    H = W = 48
    K = 4
    eq = np.zeros((H, W, K), bool)
    yy, xx = np.mgrid[:H, :W]
    # k=0 ellipse, k=1 rotated bar, k=2 single pixel, k=3 empty
    eq[..., 0] = ((yy - 12) / 6.0) ** 2 + ((xx - 30) / 11.0) ** 2 <= 1
    bar = (np.abs((xx - 20) - (yy - 30)) <= 2) & (yy >= 24) & (yy <= 40) & (xx >= 10) & (xx <= 34)
    eq[..., 1] = bar
    eq[32, 5, 2] = True
    res = min_area_rect_from_mask_stack(eq)
    for k in range(2):
        pts = np.argwhere(eq[..., k])[:, ::-1]  # (x, y)
        sub = {kk: np.asarray(v[k]) for kk, v in res.items()}
        assert bool(sub["valid"])
        _assert_rect_matches(sub, pts)
    assert bool(np.asarray(res["valid"])[2])
    np.testing.assert_allclose(np.asarray(res["center"])[2], [5, 32], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["size"])[2], [0, 0], atol=1e-5)
    assert not bool(np.asarray(res["valid"])[3])


@pytest.mark.slow
def test_scan_path_vs_serial_reference_fuzz():
    """Production scan-based rect path vs the serial monotone-chain reference
    and cv2, on random multi-blob masks."""
    import jax.numpy as jnp

    from ubdvss_tpu.ops.rect import min_area_rect_from_extremes

    rng = np.random.default_rng(7)
    H = W = 40
    for trial in range(6):
        mask = np.zeros((H, W), bool)
        yy, xx = np.mgrid[:H, :W]
        for _ in range(3):
            cy, cx = rng.integers(5, 35, 2)
            ry, rx = rng.integers(1, 7, 2)
            ang = rng.uniform(0, np.pi)
            dy, dx = yy - cy, xx - cx
            u = dy * np.cos(ang) - dx * np.sin(ang)
            v = dy * np.sin(ang) + dx * np.cos(ang)
            mask |= (np.abs(u) <= ry) & (np.abs(v) <= rx)
        minx = np.where(mask, xx, 10**6).min(1)
        maxx = np.where(mask, xx, -1).max(1)
        rowv = mask.any(1)
        res = min_area_rect_from_extremes(
            jnp.asarray(minx, jnp.int32)[None],
            jnp.asarray(maxx, jnp.int32)[None],
            jnp.asarray(rowv)[None],
        )
        res = {k: np.asarray(v)[0] for k, v in res.items()}
        if not rowv.any():
            assert not res["valid"]
            continue
        pts = np.argwhere(mask)[:, ::-1]
        _assert_rect_matches(res, pts)
        # serial reference agreement (area identical to 1e-4)
        cand = np.stack(
            [np.concatenate([minx, maxx]), np.concatenate([np.arange(H)] * 2)], 1
        ).astype(np.int32)
        hull, m = monotone_chain_hull(
            jnp.asarray(np.where(np.concatenate([rowv, rowv])[:, None], cand, 0)),
            jnp.asarray(np.concatenate([rowv, rowv])),
        )
        ref = min_area_rect(hull, m)
        assert abs(float(np.prod(res["size"])) - float(np.prod(np.asarray(ref["size"])))) < 1e-3


@pytest.mark.slow
def test_compact_extremes_matches_exact():
    """Hull-compacted caliper (large-heatmap path) == exact extremes path
    for components whose chains fit max_hull_points (all realistic blobs)."""
    from ubdvss_tpu.ops.rect import (
        min_area_rect_from_extremes,
        min_area_rect_from_extremes_compact,
    )

    rng = np.random.default_rng(1)
    B, K, H = 3, 8, 256
    minx = np.zeros((B, K, H), np.int32)
    maxx = np.full((B, K, H), -1, np.int32)
    for b in range(B):
        for k in range(K):
            kind = rng.integers(0, 4)
            y0 = int(rng.integers(0, H - 50)); h = int(rng.integers(1, 50))
            x0 = int(rng.integers(0, H - 80)); w = int(rng.integers(1, 60))
            yy = np.arange(y0, y0 + h)
            if kind == 0:  # axis-aligned rect
                minx[b, k, y0:y0 + h] = x0
                maxx[b, k, y0:y0 + h] = x0 + w
            elif kind == 1:  # ellipse
                cy = y0 + h / 2
                half = (w / 2) * np.sqrt(
                    np.clip(1 - ((yy - cy) / (h / 2 + 1e-9)) ** 2, 0, 1))
                minx[b, k, y0:y0 + h] = (x0 + w / 2 - half).astype(int)
                maxx[b, k, y0:y0 + h] = (x0 + w / 2 + half).astype(int)
            elif kind == 2:  # sheared parallelogram
                minx[b, k, y0:y0 + h] = x0 + (yy - y0)
                maxx[b, k, y0:y0 + h] = x0 + w + (yy - y0)
            # kind 3: empty slot
    import jax
    import jax.numpy as jnp

    mi, mx = jnp.asarray(minx), jnp.asarray(maxx)
    rv = mx >= 0
    a = jax.device_get(min_area_rect_from_extremes(mi, mx, rv))
    c = jax.device_get(min_area_rect_from_extremes_compact(mi, mx, rv, 64))
    for key in ("points", "center", "size", "angle_deg", "valid"):
        np.testing.assert_allclose(
            np.asarray(a[key], np.float32), np.asarray(c[key], np.float32),
            atol=1e-4, err_msg=key,
        )


def test_rect_invariant_under_rot90():
    """SURVEY.md §4.3 property: min-area rect commutes with 90-degree
    rotation — same size (axes swapped) and area, corners mapped."""
    import jax.numpy as jnp

    from ubdvss_tpu.net_config import NetConfig
    from ubdvss_tpu.ops.postproc import postprocess

    rng = np.random.default_rng(7)
    cfg = NetConfig(max_components=4, min_component_area=1, classification=False)
    for _ in range(3):
        H = W = 48
        logits = np.full((H, W, 1), -6.0, np.float32)
        y0, x0 = rng.integers(4, 20, 2)
        hh, ww = rng.integers(8, 20, 2)
        ys, xs = np.mgrid[0:H, 0:W]
        # a tilted ellipse blob
        cy, cx = y0 + hh / 2, x0 + ww / 2
        e = (((ys - cy) * 0.8 + (xs - cx) * 0.6) / hh) ** 2 + (
            ((xs - cx) * 0.8 - (ys - cy) * 0.6) / ww
        ) ** 2
        logits[e < 0.5, 0] = 6.0
        ra = postprocess(jnp.asarray(logits), cfg)
        rb = postprocess(jnp.asarray(np.rot90(logits, 1).copy()), cfg)
        assert int(ra["num_detections"]) == int(rb["num_detections"]) == 1
        sa = np.sort(np.asarray(ra["size"])[0])
        sb = np.sort(np.asarray(rb["size"])[0])
        np.testing.assert_allclose(sa, sb, atol=1e-3)
        # rot90 maps (x, y) -> (y, W-1-x) at heatmap scale; centers must map
        ca = np.asarray(ra["center"])[0] / cfg.scale
        cb = np.asarray(rb["center"])[0] / cfg.scale
        np.testing.assert_allclose(
            cb, np.array([ca[1], (W - 1) - ca[0]]), atol=1.0
        )
