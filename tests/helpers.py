"""Shared test helpers: rect parity checks vs cv2.

Parity definition (see ubdvss_tpu/ops/rect.py docstring): the min-area rect
is unique for generic shapes — there we require corner-set equality with
cv2.minAreaRect.  Exactly symmetric (rasterized-ellipse-like) components tie
between mirrored optima and cv2's pick depends on its internal float32
rounding order; for those we require mathematical equivalence: equal minimal
area and full containment of the component's pixels.
"""

from itertools import permutations

import cv2
import numpy as np


def corner_match(ours_box: np.ndarray, ref_box: np.ndarray, tol: float) -> bool:
    cost = np.linalg.norm(ours_box[:, None, :] - ref_box[None, :, :], axis=-1)
    return (
        min(sum(cost[i, p[i]] for i in range(4)) for p in permutations(range(4))) / 4
        < tol
    )


def assert_rect_parity(res: dict, pts_np: np.ndarray, scale: float = 1.0, atol=1e-2):
    """res: dict with 'points' (4,2), 'size' (2,) etc (already scaled by
    `scale`); pts_np: (N,2) int component pixel coords (x, y) at heatmap res."""
    rect_cv = cv2.minAreaRect(pts_np.astype(np.int32).reshape(-1, 1, 2))
    (cx, cy), (w, h), ang = rect_cv
    box_cv = cv2.boxPoints(rect_cv) * scale
    area_cv = w * h * scale * scale
    ours = np.asarray(res["points"], np.float64)
    ours_area = float(np.asarray(res["size"]).prod())
    scale_tol = max(atol, 1e-4 * max(area_cv, 1.0))
    assert ours_area <= area_cv + scale_tol, (ours_area, area_cv)
    if corner_match(ours, box_cv, max(atol, 1e-3 * max(w, h, 1.0) * scale)):
        return
    # tie case: equal area + containment of every pixel
    assert abs(ours_area - area_cv) <= scale_tol, (ours_area, area_cv)
    poly = ours.astype(np.float32).reshape(-1, 1, 2)
    for p in pts_np * scale:
        d = cv2.pointPolygonTest(poly, (float(p[0]), float(p[1])), True)
        assert d >= -1e-2 * max(scale, 1.0), (p, ours)
