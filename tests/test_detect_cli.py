"""detect CLI end-to-end over image files on disk."""

import json

import numpy as np

from ubdvss_tpu import NetConfig, init_params
from ubdvss_tpu import detect as detect_mod
from ubdvss_tpu.synthetic import SyntheticMarkupReader
from ubdvss_tpu.utils.checkpoint import save_params_npz


def test_detect_cli(tmp_path):
    import cv2

    reader = SyntheticMarkupReader(n_samples=2, image_hw=(128, 128), seed=3)
    for i in range(2):
        cv2.imwrite(str(tmp_path / f"im{i}.png"), reader.sample_at(i).image)
    cfg = NetConfig()
    wpath = str(tmp_path / "w.npz")
    save_params_npz(wpath, init_params(cfg, 0))
    out = str(tmp_path / "dets.json")
    overlays = str(tmp_path / "ov")
    report = detect_mod.main(
        [
            "--images", str(tmp_path),
            "--checkpoint", wpath,
            "--output", out,
            "--save-overlays", overlays,
        ]
    )
    assert len(report) == 2
    with open(out) as f:
        j = json.load(f)
    assert set(j) == set(report)
    import os

    assert len(os.listdir(overlays)) == 2
