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


def test_packed_int8_trunk_bit_exact():
    """The s=2-packed int8 trunk (large-scan serving route) reproduces the
    direct int8 path bit-for-bit: packed kernels place the original int8
    values block-wise, so every int32 accumulator — and the f32 logits —
    is identical (ops/quant._packed_layer exactness note)."""
    from ubdvss_tpu.ops.quant import int8_packed_trunk_apply

    cfg = _cfg()
    params = init_params(cfg, 0)
    raw, norm = _images(n=2, hw=(128, 136))
    q = quantize_trunk(params, cfg, norm)
    direct = int8_trunk_apply(q, norm, cfg)
    packed = int8_packed_trunk_apply(q, norm, cfg, unpack=True)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(direct))
    # raw-grayscale input quantization folds identically on the packed path
    packed_raw = int8_packed_trunk_apply(q, raw, cfg, raw_gray=True, unpack=True)
    np.testing.assert_array_equal(np.asarray(packed_raw), np.asarray(direct))


@pytest.mark.slow  # 44 s; bit-exactness already gated by test_packed_int8_trunk_bit_exact
def test_packed_int8_phase_major_layout():
    """Without unpack the packed logits are phase-major (B, H/8, W/8, 4*O)
    and postprocess_batch_fused(packed_phases=(2, 2)) consumes them with
    identical detections to the unpacked logits."""
    from ubdvss_tpu.ops.postproc import postprocess_batch_fused
    from ubdvss_tpu.ops.quant import int8_packed_trunk_apply

    cfg = _cfg()
    params = init_params(cfg, 0)
    _, norm = _images(n=2, hw=(128, 128))
    q = quantize_trunk(params, cfg, norm)
    O = 1 + cfg.n_classes
    pk = int8_packed_trunk_apply(q, norm, cfg)
    assert pk.shape == (2, 16, 16, 4 * O)
    up = int8_packed_trunk_apply(q, norm, cfg, unpack=True)
    rp = jax.device_get(
        postprocess_batch_fused(pk, cfg, interpret=True, packed_phases=(2, 2))
    )
    ru = jax.device_get(postprocess_batch_fused(up, cfg, interpret=True))
    np.testing.assert_array_equal(rp["valid"], ru["valid"])
    np.testing.assert_array_equal(rp["num_detections"], ru["num_detections"])
    v = np.asarray(ru["valid"])
    np.testing.assert_allclose(
        np.asarray(rp["boxes"])[v], np.asarray(ru["boxes"])[v], atol=1e-4
    )


@pytest.mark.tpu
@pytest.mark.slow
def test_int8_large_scan_packed_route_tpu():
    """detect_program_batch(qparams=...) at >=1024px auto-routes through the
    packed int8 trunk (the direct int8 trunk at this size sits in XLA's
    degraded large-spatial conv regime — compiling it here is exactly what
    the route avoids, so packed-vs-direct bit-exactness is locked at small
    scale in test_packed_int8_trunk_bit_exact instead).  This test checks
    the large-scan plumbing on the real chip: the route compiles, the
    returned logits are the unpacked packed-trunk logits, and detections on
    the pretrained asset match the bf16/f32 fused route."""
    import os

    from ubdvss_tpu.inference import detect_program_batch
    from ubdvss_tpu.ops.quant import int8_packed_trunk_apply
    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.utils.checkpoint import load_params_npz

    cfg = NetConfig(max_components=16, min_component_area=3)
    params = load_params_npz(
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "assets", "pretrained_synthetic.npz"),
        init_params(cfg, 0),
    )
    reader = SyntheticMarkupReader(n_samples=2, image_hw=(1024, 1024), seed=5)
    imgs = jnp.stack(
        [jnp.asarray(reader.sample_at(i).image) for i in range(2)]
    )
    _, calib = _images(n=8, hw=(512, 512), seed=77)
    q = quantize_trunk(params, cfg, calib)
    res, logits = detect_program_batch(
        params, imgs, cfg, (1024, 1024), qparams=q
    )
    want = int8_packed_trunk_apply(
        q, imgs.astype(jnp.float32), cfg, raw_gray=True, unpack=True
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(want))
    ref, _ = detect_program_batch(params, imgs, cfg, (1024, 1024))
    res, ref = jax.device_get((res, ref))
    np.testing.assert_array_equal(res["valid"], ref["valid"])
    np.testing.assert_array_equal(res["classes"], ref["classes"])
    v = np.asarray(ref["valid"])
    np.testing.assert_allclose(
        np.asarray(res["boxes"])[v], np.asarray(ref["boxes"])[v], atol=1.5
    )


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
    _, fl = trunk_intermediates(params, norm, cfg)
    rf = jax.device_get(postprocess_batch_fused(fl, cfg, interpret=True))
    v = np.asarray(rf["valid"])

    # strict rounding-equivalence gate on the UNCORRECTED trunk (pure
    # quantization noise, no calibration-statistics dependence) ...
    q0 = quantize_trunk(params, cfg, calib, bias_correct=False)
    ql = int8_trunk_apply(q0, norm, cfg)
    # logits agree to quantization noise (measured rounding floor ~1.2 max
    # over a 10-layer requant chain; mean ~0.15)
    assert float(jnp.max(jnp.abs(ql - fl))) < 2.0
    assert float(jnp.mean(jnp.abs(ql - fl))) < 0.3
    rq = jax.device_get(postprocess_batch_fused(ql, cfg, interpret=True))
    np.testing.assert_array_equal(rq["valid"], rf["valid"])
    np.testing.assert_array_equal(rq["classes"], rf["classes"])
    np.testing.assert_array_equal(rq["num_detections"], rf["num_detections"])
    # boxes within a pixel (borderline threshold pixels may flip)
    np.testing.assert_allclose(
        np.asarray(rq["boxes"])[v], np.asarray(rf["boxes"])[v], atol=1.5
    )

    # ... and the SHIPPING default (bias-corrected): same detections and
    # boxes; class votes may flip only where the f32 vote was a near-tie
    # (the corrected biases shift mean class probabilities slightly —
    # accuracy effect measured in BASELINE.md r5)
    q1 = quantize_trunk(params, cfg, calib)
    ql1 = int8_trunk_apply(q1, norm, cfg)
    assert float(jnp.max(jnp.abs(ql1 - fl))) < 2.0
    rq1 = jax.device_get(postprocess_batch_fused(ql1, cfg, interpret=True))
    np.testing.assert_array_equal(rq1["valid"], rf["valid"])
    np.testing.assert_array_equal(rq1["num_detections"], rf["num_detections"])
    np.testing.assert_allclose(
        np.asarray(rq1["boxes"])[v], np.asarray(rf["boxes"])[v], atol=1.5
    )
    cp = np.asarray(rf["class_probs"])
    top2 = np.sort(cp, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    flipped = (np.asarray(rq1["classes"]) != np.asarray(rf["classes"])) & v
    assert np.all(margin[flipped] < 0.05), margin[flipped]


def test_bias_correction_reduces_logits_error():
    """bias_correct_qparams (PTQ bias correction, VERDICT r4 item 4) must
    shrink the quantized trunk's mean logits error vs the f32 reference —
    on both architectures."""
    from ubdvss_tpu.ops.quant import bias_correct_qparams

    for cfg in (_cfg(), NetConfig(separable_context=False, max_components=8)):
        params = init_params(cfg, 1)
        _, calib = _images(n=8, hw=(128, 128), seed=21)
        _, norm = _images(n=4, hw=(128, 128), seed=22)
        q0 = quantize_trunk(params, cfg, calib, bias_correct=False)
        q1 = quantize_trunk(params, cfg, calib, bias_correct=True)
        _, fl = trunk_intermediates(params, norm, cfg)
        e0 = float(jnp.mean(jnp.abs(int8_trunk_apply(q0, norm, cfg) - fl)))
        e1 = float(jnp.mean(jnp.abs(int8_trunk_apply(q1, norm, cfg) - fl)))
        assert e1 <= e0, (e1, e0)
        # only biases differ: kernels and requant scales are untouched, so
        # the packed serving trunks remain bit-exact vs the direct path
        np.testing.assert_array_equal(
            np.asarray(q0["layers"][0]["q"]), np.asarray(q1["layers"][0]["q"])
        )


@pytest.mark.slow  # ~4 min on the 1-core host (48-scene 256px int8 eval)
def test_int8_bias_corrected_f1_parity_separable():
    """The r4 serving-accuracy protocol (48 synthetic scenes @256px,
    calib = first 32 eval-pipeline images) measured the separable asset's
    PTQ gap at F1 0.966->0.940; bias correction closes it completely
    (measured r5: 0.9661 int8 == 0.9661 f32, tp 114 vs uncorrected 110).
    This gate runs the identical protocol's int8 arm and holds the
    RECOVERED bar — it fails on a bias-correction regression (the
    uncorrected trunk scores 0.940).  The effect is protocol-sensitive
    (other seeds show +-0.5pt noise, BASELINE.md r5); this is the
    documented row."""
    import dataclasses
    import os

    from ubdvss_tpu.data import Batches, DataConfig
    from ubdvss_tpu.evaluate import run_evaluation
    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.utils.checkpoint import load_net_config, load_params_npz

    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "pretrained_synthetic.npz",
    )
    cfg = load_net_config(asset)
    params = load_params_npz(asset, init_params(cfg, 0))
    reader = SyntheticMarkupReader(n_samples=48, image_hw=(256, 256))
    dc = DataConfig(batch_size=8, train_hw=(256, 256), max_polys=32)
    cal = []
    for batch in Batches(reader, cfg, dataclasses.replace(
        dc, shuffle=False, augment=None, drop_remainder=False
    ), train=False).epoch(0):
        cal.append(np.asarray(batch["images"]))
        if sum(c.shape[0] for c in cal) >= 32:
            break
    q = quantize_trunk(params, cfg, jnp.asarray(np.concatenate(cal)[:32]))
    rq = run_evaluation(params, reader, cfg, dc, qparams=q)
    assert rq.f1 >= 0.96, rq.f1  # f32 == 0.9661 on this exact protocol
