"""On-device rasterization vs cv2.fillPoly (SURVEY.md §4.2)."""

import cv2
import numpy as np
import pytest

from ubdvss_tpu.ops.rasterize import polygons_to_grid, rasterize_polygons


def _cv2_fill(polys, class_ids, hw):
    out = np.zeros(hw, np.int32)
    for poly, cid in zip(polys, class_ids):
        m = np.zeros(hw, np.uint8)
        cv2.fillPoly(m, [np.asarray(poly, np.int32)], 1)
        out[m > 0] = cid
    return out


def _run_ours(polys, class_ids, hw, V=16):
    P = len(polys)
    pad = np.zeros((P, V, 2), np.float32)
    nv = np.zeros(P, np.int32)
    for i, p in enumerate(polys):
        pad[i, : len(p)] = p
        nv[i] = len(p)
    return np.asarray(
        rasterize_polygons(pad, nv, np.asarray(class_ids, np.int32), hw)
    )


def _agreement(ours, ref):
    return (ours == ref).mean()


def test_axis_aligned_rect():
    poly = [(2, 3), (10, 3), (10, 8), (2, 8)]
    ours = _run_ours([poly], [1], (16, 16))
    ref = _cv2_fill([poly], [1], (16, 16))
    np.testing.assert_array_equal(ours, ref)


def test_triangle_and_overlap_order():
    t1 = [(1, 1), (12, 2), (6, 12)]
    t2 = [(4, 4), (14, 4), (14, 14), (4, 14)]
    ours = _run_ours([t1, t2], [3, 7], (16, 16))
    ref = _cv2_fill([t1, t2], [3, 7], (16, 16))
    # interiors must agree exactly; boundaries may differ by cv2's line
    # rasterization conventions on slanted edges — require >=98% agreement
    # and exact agreement off the boundary band.
    assert _agreement(ours, ref) >= 0.99, _agreement(ours, ref)


@pytest.mark.parametrize("seed", range(4))
def test_random_convex_quads(seed):
    rng = np.random.default_rng(seed)
    H = W = 32
    polys, cids = [], []
    for i in range(3):
        cx, cy = rng.uniform(6, 26, 2)
        w, h = rng.uniform(3, 8, 2)
        ang = rng.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]])
        quad = (base @ np.array([[c, -s], [s, c]]) + [cx, cy]).round().astype(int)
        polys.append([tuple(p) for p in quad])
        cids.append(i + 1)
    ours = _run_ours(polys, cids, (H, W))
    ref = _cv2_fill(polys, cids, (H, W))
    assert _agreement(ours, ref) >= 0.99, _agreement(ours, ref)


def test_degenerate_skipped():
    ours = _run_ours([[(3, 3)], [(1, 1), (5, 5)]], [1, 2], (8, 8))
    assert ours.sum() == 0


def test_polygons_to_grid():
    p = np.array([[[10.0, 14.0], [22.0, 6.0]]])
    np.testing.assert_allclose(
        np.asarray(polygons_to_grid(p, 4)), [[[2.0, 4.0], [6.0, 2.0]]]
    )


def test_windowed_matches_dense_for_bounded_polys():
    """rasterize_polygons_windowed must equal the dense path exactly for
    polys whose AABB fits the window — including overlapping polys
    (last-wins) and frame-edge objects."""
    from ubdvss_tpu.ops.rasterize import (
        rasterize_polygons,
        rasterize_polygons_windowed,
    )

    rng = np.random.default_rng(0)
    H = W = 64
    wn = 24
    for trial in range(6):
        P, V = 5, 6
        polys = np.zeros((P, V, 2), np.float32)
        n_verts = np.zeros(P, np.int32)
        class_ids = np.zeros(P, np.int32)
        for p in range(P):
            # random convex-ish polygon with AABB <= wn-2, anywhere
            # in-frame (incl. hugging the border); overlaps allowed
            cx = rng.uniform(2, W - 2)
            cy = rng.uniform(2, H - 2)
            nv = int(rng.integers(3, V + 1))
            ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
            r = rng.uniform(2, (wn - 5) / 2, nv)
            xs = np.clip(np.round(cx + r * np.cos(ang)), 0, W - 1)
            ys = np.clip(np.round(cy + r * np.sin(ang)), 0, H - 1)
            polys[p, :nv, 0] = xs
            polys[p, :nv, 1] = ys
            n_verts[p] = nv
            class_ids[p] = 1 + int(rng.integers(0, 4))
        dense = np.asarray(rasterize_polygons(
            polys, n_verts, class_ids, (H, W)
        ))
        windowed = np.asarray(rasterize_polygons_windowed(
            polys, n_verts, class_ids, (H, W), wn
        ))
        np.testing.assert_array_equal(windowed, dense, err_msg=f"trial {trial}")
