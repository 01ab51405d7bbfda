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
