"""detect() end-to-end API smoke + pipeline-composition tests."""

import numpy as np
import pytest

from ubdvss_tpu import NetConfig, init_params
from ubdvss_tpu.inference import BarcodeDetector, detect_program, detect_program_batch


def _forced_blob_params(cfg):
    """Params whose head bias forces a detection: zero conv weights, so the
    detection logit is the head's (known) bias — then we flip its sign via
    the input-independent path to make deterministic output impossible;
    instead we just set a large positive detection bias so the whole heatmap
    fires, giving exactly one full-frame component."""
    import jax

    params = init_params(cfg, 0)
    params = jax.tree.map(lambda p: p * 0.0, params)
    head_b = np.zeros((cfg.n_output_channels,), np.float32)
    head_b[0] = 5.0  # detection channel on everywhere
    if cfg.classification:
        head_b[1 + 2] = 3.0  # class 2 wins
    params["head"]["bias"] = head_b
    return params


def test_detect_full_frame_component():
    cfg = NetConfig(max_components=4, min_component_area=1)
    params = _forced_blob_params(cfg)
    det = BarcodeDetector(cfg, params)
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    out = det.detect(img)
    assert len(out) == 1
    d = out[0]
    assert d.class_id == 2 and d.class_name == cfg.class_names[2]
    assert d.score > 0.99
    # full-frame component -> rect covers the whole heatmap, scaled x4
    np.testing.assert_allclose(np.sort(d.box[:, 0]), [0, 0, 60, 60], atol=1e-3)
    np.testing.assert_allclose(np.sort(d.box[:, 1]), [0, 0, 60, 60], atol=1e-3)
    hm = det.heatmap(img)
    assert hm.shape == (16, 16) and np.all(hm > 0.99)


@pytest.mark.slow
def test_detect_resized_input():
    cfg = NetConfig(max_components=4, min_component_area=1, max_image_side=64)
    params = _forced_blob_params(cfg)
    det = BarcodeDetector(cfg, params)
    img = np.random.default_rng(1).integers(0, 256, (128, 96), dtype=np.uint8)
    out = det.detect(img)
    assert len(out) == 1
    # rect rescaled back to original 128x96 coords
    assert out[0].box[:, 0].max() <= 96 and out[0].box[:, 1].max() <= 128
    assert out[0].box[:, 1].max() > 100


@pytest.mark.slow
def test_batch_program_matches_single():
    cfg = NetConfig(max_components=4, min_component_area=1)
    params = _forced_blob_params(cfg)
    imgs = np.random.default_rng(2).integers(0, 256, (2, 32, 32), dtype=np.uint8)
    res_b, logits_b = detect_program_batch(params, imgs, cfg, (32, 32))
    res_0, logits_0 = detect_program(params, imgs[0], cfg, (32, 32))
    np.testing.assert_allclose(np.asarray(logits_b)[0], np.asarray(logits_0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_b["boxes"])[0], np.asarray(res_0["boxes"]), atol=1e-5
    )


def test_pretrained_assets_load_and_detect():
    """Both bundled assets (separable 11.9k + capacity-parity dense 42.3k)
    load into their architectures and detect on a synthetic scene."""
    import os

    from ubdvss_tpu.models.model import param_count
    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.utils.checkpoint import load_params_npz

    import jax.numpy as jnp

    root = os.path.join(os.path.dirname(__file__), "..", "assets")
    reader = SyntheticMarkupReader(n_samples=1, image_hw=(256, 256), seed=5)
    img = jnp.asarray(reader.sample_at(0).image)
    for fname, cfg in [
        ("pretrained_synthetic.npz", NetConfig(max_components=8)),
        (
            "pretrained_dense_synthetic.npz",
            NetConfig(max_components=8, separable_context=False),
        ),
    ]:
        params = load_params_npz(os.path.join(root, fname), init_params(cfg, 0))
        assert param_count(params) > 40_000 if not cfg.separable_context else True
        res, _ = detect_program_batch(params, img[None], cfg, (256, 256), fused=False)
        assert int(res["num_detections"][0]) >= 1, fname


@pytest.mark.tpu
@pytest.mark.slow
def test_packed_trunk_detections_match_tpu():
    """2048px auto route (fully packed trunk + packed postprocessing) must
    produce the same detections as the whole-image fused path (n_strips=1
    forces it).  f32 so both routes share the dense/DEFAULT numerics tier."""
    import jax
    import jax.numpy as jnp

    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.utils.checkpoint import load_params_npz
    import os

    cfg = NetConfig(max_components=32, dtype="float32")
    params = load_params_npz(
        os.path.join(os.path.dirname(__file__), "..", "assets",
                     "pretrained_synthetic.npz"),
        init_params(cfg, 0),
    )
    reader = SyntheticMarkupReader(n_samples=2, image_hw=(2048, 2048), seed=11)
    imgs = jnp.stack(
        [jnp.asarray(reader.sample_at(i).image) for i in range(2)]
    )
    res_a, _ = detect_program_batch(params, imgs, cfg, (2048, 2048), fused=True)
    res_b, _ = detect_program_batch(
        params, imgs, cfg, (2048, 2048), fused=True, n_strips=1
    )
    res_a, res_b = jax.device_get((res_a, res_b))
    np.testing.assert_array_equal(res_a["valid"], res_b["valid"])
    np.testing.assert_array_equal(res_a["areas"], res_b["areas"])
    np.testing.assert_array_equal(res_a["classes"], res_b["classes"])
    np.testing.assert_allclose(res_a["boxes"], res_b["boxes"], atol=1e-2)
    np.testing.assert_allclose(res_a["scores"], res_b["scores"], atol=1e-4)


def test_fused_heatmap_limit_by_architecture():
    """Dense-context configs keep the r3-validated 512^2 fused-heatmap
    cutoff (the 1024^2 extension is validated only on the separable
    two-stage packed route — ADVICE r4 medium)."""
    from ubdvss_tpu.inference import _fused_heatmap_limit

    assert _fused_heatmap_limit(NetConfig()) == 1024
    assert _fused_heatmap_limit(NetConfig(separable_context=False)) == 512
