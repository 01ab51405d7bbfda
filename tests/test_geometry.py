"""Polygon IoU vs cv2 oracle + brute force (SURVEY.md §4.2)."""

import cv2
import numpy as np
import pytest

from ubdvss_tpu.utils.geometry import (
    clip_polygon,
    iou,
    polygon_area,
    polygon_intersection_area,
)


def _rect(cx, cy, w, h, ang_deg):
    return cv2.boxPoints(((cx, cy), (w, h), ang_deg)).astype(np.float64)


def test_area():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    assert polygon_area(sq) == 4.0
    assert polygon_area(sq[::-1]) == 4.0  # orientation-independent


def test_clip_identical_and_disjoint():
    a = _rect(5, 5, 4, 4, 0)
    assert abs(polygon_intersection_area(a, a) - 16.0) < 1e-9
    b = _rect(50, 50, 4, 4, 30)
    assert polygon_intersection_area(a, b) == 0.0
    assert iou(a, b) == 0.0
    assert abs(iou(a, a) - 1.0) < 1e-9


@pytest.mark.parametrize("seed", range(8))
def test_intersection_vs_cv2(seed):
    rng = np.random.default_rng(seed)
    a = _rect(*rng.uniform(8, 24, 2), *rng.uniform(4, 16, 2), rng.uniform(0, 180))
    b = _rect(*rng.uniform(8, 24, 2), *rng.uniform(4, 16, 2), rng.uniform(0, 180))
    ours = polygon_intersection_area(a, b)
    ra = ((0, 0), (0, 0), 0)
    # cv2 wants ((cx,cy),(w,h),ang) RotatedRects
    ra = cv2.minAreaRect(a.astype(np.float32))
    rb = cv2.minAreaRect(b.astype(np.float32))
    code, pts = cv2.rotatedRectangleIntersection(ra, rb)
    ref = 0.0
    if pts is not None and len(pts) >= 3:
        ref = cv2.contourArea(cv2.convexHull(pts))
    assert abs(ours - ref) < 1e-2 * max(ref, 1.0), (ours, ref)


def test_triangle_clip():
    tri = np.array([[0, 0], [4, 0], [0, 4]], float)
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    inter = polygon_intersection_area(tri, sq)
    # triangle cut by unit-2 square: area = 4 - 0.5*2*2/2... compute: region
    # x,y>=0, x<=2, y<=2, x+y<=4 -> square minus corner triangle (x+y>4):
    # corner triangle has legs 0 -> area 4 (x+y<=4 holds in the whole square)
    assert abs(inter - 4.0) < 1e-9
    sq2 = np.array([[3, 3], [5, 3], [5, 5], [3, 5]], float)
    # triangle region is x>=0, y>=0, x+y<=4; with x,y >= 3 we get x+y >= 6,
    # so the intersection is empty
    assert polygon_intersection_area(tri, sq2) == 0.0
