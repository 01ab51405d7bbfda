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


def test_detect_cli_npz_sidecar_autoconfig(tmp_path):
    """A non-default architecture saved with its per-file net_config sidecar
    is rebuilt automatically by the detect CLI (no flags needed), even with
    a differently-shaped .npz in the same directory."""
    import cv2

    from ubdvss_tpu.utils.checkpoint import load_net_config

    reader = SyntheticMarkupReader(n_samples=1, image_hw=(128, 128), seed=3)
    cv2.imwrite(str(tmp_path / "im.png"), reader.sample_at(0).image)
    dense = NetConfig(separable_context=False)
    save_params_npz(str(tmp_path / "dense.npz"), init_params(dense, 0), cfg=dense)
    # a default-architecture file sharing the directory must not confuse it
    save_params_npz(str(tmp_path / "sep.npz"), init_params(NetConfig(), 0))
    loaded = load_net_config(str(tmp_path / "dense.npz"))
    assert loaded is not None and not loaded.separable_context
    assert load_net_config(str(tmp_path / "sep.npz")) is None
    report = detect_mod.main(
        ["--images", str(tmp_path / "im.png"), "--checkpoint", str(tmp_path / "dense.npz")]
    )
    assert len(report) == 1


def test_bundled_assets_have_sidecars():
    import os

    from ubdvss_tpu.utils.checkpoint import load_net_config

    root = os.path.join(os.path.dirname(__file__), "..", "assets")
    sep = load_net_config(os.path.join(root, "pretrained_synthetic.npz"))
    dense = load_net_config(os.path.join(root, "pretrained_dense_synthetic.npz"))
    assert sep is not None and sep.separable_context
    assert dense is not None and not dense.separable_context
