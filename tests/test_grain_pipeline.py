"""grain multi-worker input pipeline (SURVEY.md §2b tf.data replacement)."""

import numpy as np
import pytest

pytest.importorskip("grain")

from ubdvss_tpu import NetConfig
from ubdvss_tpu.data import Batches, DataConfig, GrainBatches
from ubdvss_tpu.markup import get_markup_reader, write_json_markup
from ubdvss_tpu.synthetic import SyntheticMarkupReader


def test_grain_matches_plain_pipeline_eval():
    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=6, image_hw=(64, 64), seed=2)
    dc = DataConfig(batch_size=2, train_hw=(64, 64), augment=None, shuffle=False)
    plain = list(Batches(reader, cfg, dc, train=False).epoch(0))
    grain_b = GrainBatches(reader, cfg, dc, train=False, worker_count=0)
    got = list(grain_b.epoch(0))
    assert len(got) == len(plain) == len(grain_b)
    for a, b in zip(plain, got):
        np.testing.assert_allclose(
            np.asarray(a["images"]), np.asarray(b["images"]), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(a["segmap"]), np.asarray(b["segmap"]))


def test_grain_disk_dataset(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    markup = {}
    for i in range(4):
        name = f"im{i}.png"
        cv2.imwrite(str(tmp_path / name), rng.integers(0, 255, (40, 40), np.uint8))
        markup[name] = [
            {"type": "QRCode", "points": [[5, 5], [20, 5], [20, 20], [5, 20]]}
        ]
    write_json_markup(tmp_path, markup)
    reader = get_markup_reader("zvz-json", tmp_path)
    cfg = NetConfig()
    dc = DataConfig(batch_size=2, train_hw=(32, 32), augment=None, shuffle=False)
    batches = list(GrainBatches(reader, cfg, dc, train=False, worker_count=0))
    assert len(batches) == 2
    assert batches[0]["images"].shape == (2, 32, 32, 1)
    assert (np.asarray(batches[0]["segmap"]) > 0).any()
