"""int8 quantized inference trunk (ops/quant.py): calibration math,
input-quantization exactness, and detection equivalence vs the f32 path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ubdvss_tpu import NetConfig, init_params
from ubdvss_tpu.ops.quant import (
    int8_trunk_apply,
    quantize_trunk,
    trunk_intermediates,
)


def _cfg():
    return NetConfig(max_components=8, min_component_area=3)


def _images(n=4, hw=(128, 128), seed=3):
    from ubdvss_tpu.synthetic import SyntheticMarkupReader

    reader = SyntheticMarkupReader(n_samples=n, image_hw=hw, seed=seed)
    raw = np.stack([reader.sample_at(i).image for i in range(n)])
    norm = raw.astype(np.float32) / 127.5 - 1.0
    return jnp.asarray(raw), jnp.asarray(norm)[..., None]


def test_trunk_intermediates_matches_model():
    """The calibration forward is the production f32 model bit-for-bit
    (same dense rank-1 expansion as dense_context_head)."""
    from ubdvss_tpu.models.model import get_model

    cfg = _cfg()
    params = init_params(cfg, 0)
    _, norm = _images()
    ref = get_model(cfg).apply({"params": params}, norm)
    acts, logits = trunk_intermediates(params, norm, cfg)
    assert len(acts) == 2 + len(cfg.dilations)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), atol=2e-5
    )


def test_dense_context_checkpoints_quantize():
    """separable_context=False params (e.g. the bundled dense asset)
    quantize through the same path — the layer's own dense kernel is used
    instead of the rank-1 expansion."""
    from ubdvss_tpu.models.model import get_model

    cfg = NetConfig(separable_context=False, max_components=8)
    params = init_params(cfg, 0)
    _, norm = _images(n=2)
    ref = get_model(cfg).apply({"params": params}, norm)
    acts, logits = trunk_intermediates(params, norm, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=2e-5)
    q = quantize_trunk(params, cfg, norm)
    ql = int8_trunk_apply(q, norm, cfg)
    assert float(jnp.max(jnp.abs(ql - logits))) < 2.0


def test_raw_gray_input_quantization_exact():
    """round(v*127/127.5 - 127) == round(((v/127.5) - 1)*127): the folded
    raw-grayscale input quantization is bit-identical to quantizing the
    normalized image."""
    cfg = _cfg()
    params = init_params(cfg, 0)
    raw, norm = _images()
    q = quantize_trunk(params, cfg, norm)
    la = int8_trunk_apply(q, raw, cfg, raw_gray=True)
    lb = int8_trunk_apply(q, norm, cfg)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_int8_detections_match_f32():
    """Quantized trunk + standard fused postprocessing finds the same
    boxes/classes as the f32 path on the pretrained asset (the int8 mode's
    contract, like the bf16 route's)."""
    import os

    from ubdvss_tpu.ops.postproc import postprocess_batch_fused
    from ubdvss_tpu.utils.checkpoint import load_params_npz

    cfg = NetConfig(max_components=8, min_component_area=3)
    params = init_params(cfg, 0)
    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "pretrained_synthetic.npz",
    )
    if os.path.exists(asset):
        params = load_params_npz(asset, params)
    _, norm = _images(n=4, hw=(128, 128), seed=11)
    # calibration pool: disjoint seeds from the eval images (realistic PTQ)
    _, calib = _images(n=32, hw=(128, 128), seed=77)
    q = quantize_trunk(params, cfg, calib)
    ql = int8_trunk_apply(q, norm, cfg)
    _, fl = trunk_intermediates(params, norm, cfg)
    # logits agree to quantization noise (measured rounding floor ~1.2 max
    # over a 10-layer requant chain; mean ~0.15)
    assert float(jnp.max(jnp.abs(ql - fl))) < 2.0
    assert float(jnp.mean(jnp.abs(ql - fl))) < 0.3
    rq = jax.device_get(postprocess_batch_fused(ql, cfg, interpret=True))
    rf = jax.device_get(postprocess_batch_fused(fl, cfg, interpret=True))
    np.testing.assert_array_equal(rq["valid"], rf["valid"])
    np.testing.assert_array_equal(rq["classes"], rf["classes"])
    np.testing.assert_array_equal(rq["num_detections"], rf["num_detections"])
    # boxes within a pixel (borderline threshold pixels may flip)
    v = np.asarray(rf["valid"])
    np.testing.assert_allclose(
        np.asarray(rq["boxes"])[v], np.asarray(rf["boxes"])[v], atol=1.5
    )
