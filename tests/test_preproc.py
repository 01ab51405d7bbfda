"""Fused preproc vs OpenCV float-path oracle (SURVEY.md §4.2)."""

import cv2
import numpy as np
import pytest

from ubdvss_tpu import NetConfig
from ubdvss_tpu.ops.preproc import (
    normalize,
    preprocess,
    preprocess_batch,
    resize_bilinear,
    rgb_to_grayscale,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((64, 64), (32, 32)),
        ((64, 48), (64, 48)),  # identity
        ((37, 53), (20, 28)),  # odd sizes, downscale
        ((20, 28), (37, 53)),  # upscale
        ((512, 512), (128, 128)),
        ((5, 5), (4, 4)),
    ],
)
def test_resize_matches_cv2_float(in_hw, out_hw):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, in_hw).astype(np.float32)
    ours = np.asarray(resize_bilinear(img, out_hw))
    ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-5)


def test_resize_channels():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (30, 40, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(img, (15, 20)))
    ref = cv2.resize(img, (20, 15), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-5)


def test_grayscale_matches_cv2_float():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    ours_rgb = np.asarray(rgb_to_grayscale(img, "rgb"))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(ours_rgb, ref, atol=1e-3, rtol=1e-6)
    ours_bgr = np.asarray(rgb_to_grayscale(img, "bgr"))
    ref_bgr = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    np.testing.assert_allclose(ours_bgr, ref_bgr, atol=1e-3, rtol=1e-6)


def test_normalize_range():
    x = np.array([0.0, 127.5, 255.0], np.float32)
    np.testing.assert_allclose(np.asarray(normalize(x)), [-1, 0, 1], atol=1e-7)


def test_full_preprocess_pipeline_vs_cv2():
    """uint8 color image -> normalized grid tensor, vs the cv2 float path."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (101, 157, 3), dtype=np.uint8)
    cfg = NetConfig(max_image_side=128)
    out_hw = cfg.grid_size(101, 157)
    assert out_hw[0] % 4 == 0 and out_hw[1] % 4 == 0 and max(out_hw) <= 128
    ours = np.asarray(preprocess(img, out_hw))[..., 0]
    gray = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2GRAY)
    ref = cv2.resize(gray, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    ref = ref / 127.5 - 1.0
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_preprocess_batch_and_grayscale_input():
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (3, 40, 40), dtype=np.uint8)
    out = np.asarray(preprocess_batch(imgs, (20, 20)))
    assert out.shape == (3, 20, 20, 1)
    one = np.asarray(preprocess(imgs[1], (20, 20)))
    np.testing.assert_allclose(out[1], one, atol=1e-7)
