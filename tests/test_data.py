"""Data pipeline + augmentation tests (SURVEY.md §4.2/§4.3)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ubdvss_tpu import NetConfig
from ubdvss_tpu.data import Batches, DataConfig
from ubdvss_tpu.markup import get_markup_reader, write_json_markup
from ubdvss_tpu.ops.augment import (
    AugmentConfig,
    affine_warp,
    augment_sample,
    random_affine,
    transform_points,
)
from ubdvss_tpu.synthetic import SyntheticMarkupReader


def test_synthetic_reader_deterministic():
    r1 = SyntheticMarkupReader(n_samples=3, image_hw=(64, 64), seed=7)
    r2 = SyntheticMarkupReader(n_samples=3, image_hw=(64, 64), seed=7)
    s1, s2 = r1.sample_at(1), r2.sample_at(1)
    np.testing.assert_array_equal(s1.image, s2.image)
    assert s1.types == s2.types
    assert len(s1.objects) >= 1
    # polygons inside the frame
    for p in s1.polygons:
        assert p[:, 0].min() >= -1 and p[:, 0].max() <= 65


def test_json_and_xml_readers(tmp_path):
    import cv2

    img = np.zeros((10, 12), np.uint8)
    cv2.imwrite(str(tmp_path / "a.png"), img)
    write_json_markup(
        tmp_path,
        {"a.png": [{"type": "QRCode", "points": [[1, 1], [5, 1], [5, 5], [1, 5]]}]},
    )
    r = get_markup_reader("zvz-json", tmp_path)
    (s,) = r.samples()
    assert s.objects[0].type_name == "QRCode"
    assert s.objects[0].points.shape == (4, 2)

    xml = (
        '<image name="a.png"><barcode type="EAN13">'
        '<point x="0" y="0"/><point x="4" y="0"/><point x="4" y="3"/>'
        "</barcode></image>"
    )
    (tmp_path / "a.xml").write_text(xml)
    rx = get_markup_reader("zvz-xml", tmp_path)
    (sx,) = rx.samples()
    assert sx.objects[0].type_name == "EAN13"
    assert sx.objects[0].points.shape == (3, 2)

    with pytest.raises(ValueError):
        get_markup_reader("nope", tmp_path)


def test_affine_roundtrip_points():
    key = jax.random.key(0)
    cfg = AugmentConfig()
    m = random_affine(key, cfg, (64, 64))
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, 64, (5, 2)).astype(np.float32))
    out = transform_points(pts, m)
    # invertible: warp forward then backward returns original
    from ubdvss_tpu.ops.augment import _invert_affine

    back = transform_points(out, _invert_affine(m))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_affine_warp_identity_and_shift():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    ident = jnp.asarray([[1.0, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(np.asarray(affine_warp(img, ident, 0.0)), np.asarray(img))
    shift = jnp.asarray([[1.0, 0, 1.0], [0, 1, 0]])  # move right by 1
    w = np.asarray(affine_warp(img, shift, -1.0))
    np.testing.assert_allclose(w[:, 1:], np.asarray(img)[:, :-1])
    np.testing.assert_allclose(w[:, 0], -1.0)  # fill


def test_affine_warp_matches_gather_oracle():
    """The gather-free two-pass warp must agree with the exact per-pixel
    4-tap gather oracle: bit-tight on axis-aligned transforms, close on
    rotations away from fill boundaries (composed 1-D lerps are ~1 px
    softer than bilinear, so the check erodes the joint valid mask)."""
    from ubdvss_tpu.ops.augment import affine_warp_gather

    s = 64
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    rng = np.random.default_rng(0)
    smooth = rng.uniform(0, 255, (s + 8, s + 8)).astype(np.float32)
    k = np.ones((9, 9), np.float32) / 81.0
    smooth = np.asarray(
        jax.scipy.signal.convolve2d(jnp.asarray(smooth), jnp.asarray(k), mode="valid")
    )[:s, :s]
    plane = yy * 2.0 + xx

    def erode(mask, it=3):
        for _ in range(it):
            m = mask.copy()
            m[1:] &= mask[:-1]
            m[:-1] &= mask[1:]
            m[:, 1:] &= mask[:, :-1]
            m[:, :-1] &= mask[:, 1:]
            mask = m
        return mask

    c10, s10 = np.cos(np.radians(10)), np.sin(np.radians(10))
    cx = cy = s / 2
    cases = {
        "ident": ([[1, 0, 0], [0, 1, 0]], 1e-4),
        "shift": ([[1, 0, 0.5], [0, 1, 0.25]], 1e-3),
        "zoom": ([[1.3, 0, cx - 1.3 * cx], [0, 1.3, cy - 1.3 * cy]], 0.5),
        "rot10": (
            [[c10, -s10, cx - c10 * cx + s10 * cy], [s10, c10, cy - s10 * cx - c10 * cy]],
            1.0,
        ),
    }
    for img_np in (plane, smooth):
        for name, (m, tol) in cases.items():
            img = jnp.asarray(img_np)
            mj = jnp.asarray(np.asarray(m, np.float32))
            n = np.asarray(affine_warp(img, mj, -1.0))
            o = np.asarray(affine_warp_gather(img, mj, -1.0))
            interior = erode((n != -1.0) & (o != -1.0))
            d = np.abs(n - o)[interior]
            assert d.mean() < tol, f"{name}: interior mean {d.mean():.4f} > {tol}"
            # fill masks agree except a thin boundary ring
            assert ((n == -1.0) != (o == -1.0)).mean() < 0.03, name


def test_augment_deterministic_under_key():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (32, 32)).astype(np.float32))
    polys = jnp.asarray(rng.uniform(0, 32, (2, 4, 2)).astype(np.float32))
    cfg = AugmentConfig()
    k = jax.random.key(42)
    i1, p1 = augment_sample(k, img, polys, cfg)
    i2, p2 = augment_sample(k, img, polys, cfg)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    i3, _ = augment_sample(jax.random.key(43), img, polys, cfg)
    assert not np.allclose(np.asarray(i1), np.asarray(i3))


def test_translation_decorrelated():
    """tx/ty must come from independent subkeys (ADVICE r1: both drawn from
    one key -> perfectly correlated diagonal-only jitter)."""
    cfg = AugmentConfig(rotation_deg=0.0, scale_range=(1.0, 1.0),
                        flip_prob=0.0, translate_frac=0.2)
    center = np.array([32.0, 32.0])
    keys = jax.random.split(jax.random.key(0), 500)
    ms = jax.vmap(lambda k: random_affine(k, cfg, (64, 64)))(keys)
    # with identity rot, translation = m[:, 2] directly (center cancels)
    t = np.asarray(ms[:, :, 2]) - center
    corr = np.corrcoef(t[:, 0], t[:, 1])[0, 1]
    assert abs(corr) < 0.5, f"tx/ty correlated: r={corr:.3f}"
    assert t[:, 0].std() > 1.0 and t[:, 1].std() > 1.0


def test_flip_y_mirrors_rows():
    """flip_y_prob=1: image rows mirror and poly y-coords reflect about the
    center, consistently."""
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    cfg = AugmentConfig(rotation_deg=0.0, scale_range=(1.0, 1.0),
                        translate_frac=0.0, flip_prob=0.0, flip_y_prob=1.0,
                        brightness=0.0, contrast_range=(1.0, 1.0),
                        noise_std=0.0)
    m = random_affine(jax.random.key(0), cfg, (4, 4))
    out = np.asarray(affine_warp(img, m, 0.0))
    # y -> (h-1) - y about the pixel-center midpoint (h/2 = 2.0 here maps
    # row 0 <-> row 4 which is out of frame; center convention maps
    # y' = 2*cy - y with cy = 2.0), so row r samples source row 4-r:
    # rows 1..3 land on source rows 3..1; row 0 samples row 4 (fill).
    np.testing.assert_allclose(out[1:], np.asarray(img)[:0:-1])
    pts = transform_points(jnp.asarray([[1.0, 1.0]]), m)
    np.testing.assert_allclose(np.asarray(pts), [[1.0, 3.0]], atol=1e-5)


def test_random_crop_zooms_consistently():
    """crop_frac>0: the affine zooms in (dets get bigger) and image/poly
    stay consistent — a poly vertex tracks its image feature."""
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64), np.float32)
    img[30:34, 20:24] = 255.0  # bright blob
    cfg = AugmentConfig(rotation_deg=0.0, scale_range=(1.0, 1.0),
                        translate_frac=0.0, flip_prob=0.0, crop_frac=0.4,
                        brightness=0.0, contrast_range=(1.0, 1.0),
                        noise_std=0.0)
    for seed in range(5):
        m = np.asarray(random_affine(jax.random.key(seed), cfg, (64, 64)))
        # pure zoom: scale = 1/cs >= 1, no rotation
        assert m[0, 0] >= 1.0 - 1e-6 and abs(m[0, 1]) < 1e-6
        out = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(m), 0.0))
        blob_c = transform_points(jnp.asarray([[22.0, 32.0]]), jnp.asarray(m))
        bx, by = np.asarray(blob_c)[0]
        if 2 <= bx <= 61 and 2 <= by <= 61:  # blob center still in frame
            yy, xx = np.unravel_index(out.argmax(), out.shape)
            assert abs(xx - bx) <= m[0, 0] * 2 + 1
            assert abs(yy - by) <= m[0, 0] * 2 + 1


def test_batches_contract():
    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=10, image_hw=(96, 128), seed=3)
    dc = DataConfig(batch_size=4, train_hw=(64, 64), seed=0)
    batches = Batches(reader, cfg, dc, train=True)
    assert len(batches) == 2
    got = list(batches.epoch(0))
    assert len(got) == 2
    b = got[0]
    assert b["images"].shape == (4, 64, 64, 1)
    assert b["segmap"].shape == (4, 16, 16)
    assert b["images"].dtype == jnp.float32
    x = np.asarray(b["images"])
    assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6
    seg = np.asarray(b["segmap"])
    assert seg.min() >= 0 and seg.max() <= cfg.n_classes
    assert (seg > 0).any()  # some barcode pixels present
    # deterministic epoch under same seed/epoch index
    got2 = list(batches.epoch(0))
    np.testing.assert_array_equal(np.asarray(got[0]["images"]), np.asarray(got2[0]["images"]))


def test_batches_eval_no_augment():
    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=4, image_hw=(64, 64), seed=5)
    dc = DataConfig(batch_size=2, train_hw=(64, 64), shuffle=False)
    ev = Batches(reader, cfg, dc, train=False)
    b1 = next(iter(ev.epoch(0)))
    b2 = next(iter(ev.epoch(1)))
    np.testing.assert_array_equal(np.asarray(b1["images"]), np.asarray(b2["images"]))


def test_1d_class_textures_separable_at_stride4():
    """Round-2 diagnosis: within-1D type accuracy was ~0.15 because all 1D
    classes rendered as scale-normalized stripes, indistinguishable at the
    model's stride-4 feature resolution.  Guard the fix: stride-4
    block-mean features must separate the 7 1D classes (leave-one-out
    nearest-centroid accuracy >= 0.9 — a far weaker classifier than the
    FCN, so real confusion shows up here first)."""
    from ubdvss_tpu.net_config import CLASS_GROUPS
    from ubdvss_tpu.synthetic import _render_barcode

    def feats(t):
        h, w = t.shape
        hh, ww = h // 4, w // 4
        s4 = t[: hh * 4, : ww * 4].reshape(hh, 4, ww, 4).mean((1, 3)) / 255.0
        return np.array(
            [
                s4.mean(),
                (s4 < 0.16).mean(),
                (s4 > 0.84).mean(),
                s4[0].mean(),
                s4[-1].mean(),
                s4[:, :2].mean(),
                s4[:, -2:].mean(),
            ]
        )

    names = CLASS_GROUPS["1D"]
    X, y = [], []
    for ci, name in enumerate(names):
        for inst in range(6):
            rng = np.random.default_rng(1000 + inst)
            for (w, h) in [(56, 28), (80, 36), (104, 48)]:
                X.append(feats(_render_barcode(rng, w, h, "1D", name)))
                y.append(ci)
    X, y = np.stack(X), np.array(y)
    correct = 0
    for i in range(len(X)):
        cents = np.stack(
            [
                X[(y == c) & (np.arange(len(X)) != i)].mean(0)
                for c in range(len(names))
            ]
        )
        correct += int(np.argmin(np.linalg.norm(cents - X[i], axis=1)) == y[i])
    acc = correct / len(X)
    assert acc >= 0.9, f"1D texture separability degraded: {acc:.2f}"


def test_postal_class_textures_separable_at_stride4():
    """Same guard for the postal group: pitch / height-levels / vertical
    alignment must separate the 4 postal classes in stride-4 block-mean
    features (postal scenes render at roughly half the height of 1D — use
    the generate_sample aspect)."""
    from ubdvss_tpu.net_config import CLASS_GROUPS
    from ubdvss_tpu.synthetic import _render_barcode

    def feats(t):
        h, w = t.shape
        hh, ww = h // 4, w // 4
        s4 = t[: hh * 4, : ww * 4].reshape(hh, 4, ww, 4).mean((1, 3)) / 255.0
        rows = s4.mean(1)  # vertical darkness profile
        q = max(1, hh // 4)
        return np.array(
            [
                s4.mean(),
                rows[:q].mean(),  # top quarter
                rows[-q:].mean(),  # bottom quarter
                rows[hh // 2 - q // 2 : hh // 2 + q // 2 + 1].mean(),  # mid band
                (s4 < 0.16).mean(),
                s4.std(),
            ]
        )

    names = CLASS_GROUPS["postal"]
    X, y = [], []
    for ci, name in enumerate(names):
        for inst in range(6):
            rng = np.random.default_rng(2000 + inst)
            for (w, h) in [(56, 16), (80, 20), (104, 24)]:
                X.append(feats(_render_barcode(rng, w, h, "postal", name)))
                y.append(ci)
    X, y = np.stack(X), np.array(y)
    correct = 0
    for i in range(len(X)):
        cents = np.stack(
            [
                X[(y == c) & (np.arange(len(X)) != i)].mean(0)
                for c in range(len(names))
            ]
        )
        correct += int(np.argmin(np.linalg.norm(cents - X[i], axis=1)) == y[i])
    acc = correct / len(X)
    assert acc >= 0.9, f"postal texture separability degraded: {acc:.2f}"


def test_collate_fast_path_matches_per_sample():
    """Same-shaped batches collate through ONE stacked uint8 transfer +
    one batched program; result must equal the per-sample path exactly
    (both for grayscale RGB sources and single-channel sources)."""
    import jax.numpy as jnp

    from ubdvss_tpu.data import _collate_on_device, _to_train_shape

    rng = np.random.default_rng(0)
    out_hw = (64, 64)
    for shape in [(48, 80), (48, 80, 3)]:
        imgs = [rng.integers(0, 256, size=shape).astype(np.uint8)
                for _ in range(3)]
        polys = [rng.uniform(0, 80, size=(4, 8, 2)).astype(np.float32)
                 for _ in range(3)]
        xb, pb = _collate_on_device(imgs, polys, out_hw)
        for i in range(3):
            xi, pi = _to_train_shape(
                jnp.asarray(imgs[i]), jnp.asarray(polys[i]), out_hw
            )
            np.testing.assert_allclose(
                np.asarray(xb[i]), np.asarray(xi), atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(pb[i]), np.asarray(pi), atol=1e-5
            )
    # heterogeneous shapes take the per-sample fallback and still stack
    imgs = [rng.integers(0, 256, size=(48, 80)).astype(np.uint8),
            rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)]
    polys = [rng.uniform(0, 60, size=(4, 8, 2)).astype(np.float32)
             for _ in range(2)]
    xb, pb = _collate_on_device(imgs, polys, out_hw)
    assert xb.shape == (2, 64, 64) and pb.shape == (2, 4, 8, 2)


def test_device_cached_batches_match_streamed():
    """DeviceCachedBatches must yield the SAME batches (images, segmaps,
    polys) as host-fed Batches under the same seed/epoch — the HBM cache
    changes where the corpus lives, not what the model trains on."""
    from ubdvss_tpu.data import DeviceCachedBatches

    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=8, image_hw=(96, 128), seed=4)
    dc = DataConfig(batch_size=4, train_hw=(64, 64), seed=2)
    streamed = Batches(reader, cfg, dc, train=True)
    cached = DeviceCachedBatches(reader, cfg, dc, train=True)
    assert len(cached) == len(streamed) == 2
    for e in (0, 1):
        for bs, bc in zip(streamed.epoch(e), cached.epoch(e)):
            np.testing.assert_allclose(
                np.asarray(bc["images"]), np.asarray(bs["images"]),
                atol=1e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(bc["segmap"]), np.asarray(bs["segmap"])
            )
            np.testing.assert_allclose(
                np.asarray(bc["polys"]), np.asarray(bs["polys"]), atol=1e-4
            )
            np.testing.assert_array_equal(
                np.asarray(bc["class_ids"]), np.asarray(bs["class_ids"])
            )


def test_device_cached_batches_memory_guard():
    from ubdvss_tpu.data import DeviceCachedBatches
    import pytest as _pytest

    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=4, image_hw=(64, 64), seed=0)
    dc = DataConfig(batch_size=2, train_hw=(64, 64))
    with _pytest.raises(ValueError, match="exceeds"):
        DeviceCachedBatches(reader, cfg, dc, max_bytes=1000)
