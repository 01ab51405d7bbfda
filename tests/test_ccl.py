"""On-device CCL vs cv2.connectedComponents (SURVEY.md §4.2/§4.3)."""

import cv2
import numpy as np
import pytest

from ubdvss_tpu.ops.ccl import connected_components


def _partition_equal(ours: np.ndarray, theirs: np.ndarray) -> bool:
    """Label-invariant comparison: same background and same pixel partition."""
    if not np.array_equal(ours > 0, theirs > 0):
        return False
    fg = ours > 0
    if not fg.any():
        return True
    pairs = set(zip(ours[fg].tolist(), theirs[fg].tolist()))
    # bijection <=> each side's label count equals the number of pairs
    return len(pairs) == len(set(ours[fg])) == len(set(theirs[fg]))


def _check(mask: np.ndarray, connectivity: int):
    labels, n = connected_components(mask, connectivity=connectivity)
    labels, n = np.asarray(labels), int(n)
    n_cv, lab_cv = cv2.connectedComponents(
        mask.astype(np.uint8), connectivity=connectivity
    )
    assert n == n_cv - 1, f"count {n} != cv2 {n_cv - 1}"
    assert _partition_equal(labels, lab_cv)
    # our guarantee: components numbered in raster order of topmost-leftmost px
    if n > 0:
        firsts = [np.flatnonzero((labels == k).ravel())[0] for k in range(1, n + 1)]
        assert firsts == sorted(firsts)


SPIRAL = np.zeros((32, 32), bool)
# a long snake: worst case for naive propagation
for r in range(0, 32, 4):
    SPIRAL[r, :] = True
    if r + 2 < 32:
        SPIRAL[r : r + 3, 31 if (r // 4) % 2 == 0 else 0] = True


@pytest.mark.parametrize("connectivity", [4, 8])
def test_adversarial_masks(connectivity):
    H = W = 32
    cases = [
        np.zeros((H, W), bool),
        np.ones((H, W), bool),
        np.eye(H, dtype=bool),  # diagonal: 1 comp under 8-conn, H under 4-conn
        np.indices((H, W)).sum(0) % 2 == 0,  # checkerboard
        SPIRAL,
    ]
    single = np.zeros((H, W), bool)
    single[5, 7] = True
    cases.append(single)
    for mask in cases:
        _check(mask, connectivity)


@pytest.mark.parametrize("connectivity", [4, 8])
@pytest.mark.parametrize("density", [0.05, 0.3, 0.5, 0.7])
def test_random_masks(connectivity, density):
    rng = np.random.default_rng(0)
    for _ in range(3):
        mask = rng.random((48, 40)) < density
        _check(mask, connectivity)


def test_blob_masks():
    rng = np.random.default_rng(1)
    mask = np.zeros((64, 64), bool)
    for _ in range(8):
        cy, cx = rng.integers(8, 56, 2)
        ry, rx = rng.integers(2, 8, 2)
        yy, xx = np.mgrid[:64, :64]
        mask |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
    _check(mask, 8)
    _check(mask, 4)


def test_rectangular_image():
    rng = np.random.default_rng(2)
    mask = rng.random((17, 93)) < 0.4
    _check(mask, 8)


def test_partition_invariant_under_transpose():
    """SURVEY.md §4.3 property: the component partition commutes with a
    spatial permutation of the image (here transpose): partitions of
    labels(mask).T and labels(mask.T) must be identical."""
    rng = np.random.default_rng(11)
    for _ in range(5):
        mask = rng.random((48, 64)) < 0.35
        la, _ = connected_components(mask, connectivity=8)
        lb, _ = connected_components(mask.T, connectivity=8)
        assert _partition_equal(np.asarray(la).T, np.asarray(lb))
