"""Streaming pipeline tests (BASELINE config 5)."""

import numpy as np
import pytest

from ubdvss_tpu import NetConfig
from ubdvss_tpu.inference import detect_program
from ubdvss_tpu.streaming import StreamingDetector
from tests_common_params import forced_blob_params


@pytest.mark.slow
def test_streaming_matches_single_frame():
    cfg = NetConfig(max_components=4, min_component_area=1)
    params = forced_blob_params(cfg)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (64, 64), dtype=np.uint8) for _ in range(11)]
    sd = StreamingDetector(cfg, params, frame_hw=(64, 64), batch_size=4)
    got = dict(sd.process(iter(frames)))
    assert sorted(got) == list(range(11))  # every frame, in order, no dupes
    import jax

    for idx in (0, 5, 10):
        ref, _ = detect_program(params, frames[idx], cfg, (64, 64))
        ref = jax.device_get(ref)
        np.testing.assert_allclose(got[idx]["boxes"], ref["boxes"], atol=1e-5)
        np.testing.assert_array_equal(got[idx]["valid"], ref["valid"])


def test_streaming_empty_and_short():
    cfg = NetConfig(max_components=4, min_component_area=1)
    params = forced_blob_params(cfg)
    sd = StreamingDetector(cfg, params, frame_hw=(32, 32), batch_size=4)
    assert list(sd.process(iter([]))) == []
    frames = [np.zeros((32, 32), np.uint8) for _ in range(2)]
    out = list(sd.process(iter(frames)))
    assert [i for i, _ in out] == [0, 1]


def test_streaming_detector_dp_mesh_matches_single_device():
    """StreamingDetector(mesh=): frames shard over the data mesh with
    per-chip fused pipelines; per-frame results equal the unsharded
    stream (each shard is the same per-chip program — r5 DP serving)."""
    import os

    import jax

    from ubdvss_tpu import init_params
    from ubdvss_tpu.parallel.mesh import make_mesh
    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.utils.checkpoint import load_params_npz

    cfg = NetConfig(max_components=8)
    params = load_params_npz(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets", "pretrained_synthetic.npz"),
        init_params(cfg, 0),
    )
    reader = SyntheticMarkupReader(n_samples=8, image_hw=(128, 128), seed=3)
    frames = [np.asarray(reader.sample_at(i).image, np.uint8)
              for i in range(8)]

    sd1 = StreamingDetector(cfg, params, frame_hw=(128, 128), batch_size=4)
    r1 = {i: d for i, d in sd1.process(frames)}
    mesh = make_mesh(4, axis="data", devices=jax.devices("cpu"))
    sd4 = StreamingDetector(cfg, params, frame_hw=(128, 128), batch_size=4,
                            mesh=mesh)
    r4 = {i: d for i, d in sd4.process(frames)}
    assert r1.keys() == r4.keys()
    for i in r1:
        for k in r1[i]:
            a, b = np.asarray(r1[i][k]), np.asarray(r4[i][k])
            if a.dtype.kind == "f":
                np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f"{i}/{k}")
            else:
                np.testing.assert_array_equal(a, b, err_msg=f"{i}/{k}")

    with pytest.raises(ValueError, match="divisible"):
        StreamingDetector(cfg, params, frame_hw=(128, 128), batch_size=6,
                          mesh=mesh)
