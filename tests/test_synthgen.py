"""On-device synthetic generator (synthgen.py).

The load-bearing test is the cross-generator transfer check: a model
trained on HOST-rendered scenes (the bundled pretrained asset) must detect
and classify DEVICE-generated scenes — that is the proof that the baked
per-class signature tables reproduce the host generator's class cues.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ubdvss_tpu import NetConfig, init_params
from ubdvss_tpu.data import DataConfig
from ubdvss_tpu.synthgen import (
    DeviceSyntheticBatches,
    SynthConfig,
    build_class_tables,
    generate_scene,
)


def test_scene_contract_and_determinism():
    sc = SynthConfig(hw=(96, 96), n_objects=(1, 3), max_polys=4)
    key = jax.random.PRNGKey(3)
    img, polys, n_verts, class_ids = jax.jit(
        lambda k: generate_scene(k, sc)
    )(key)
    img2, polys2, _, _ = jax.jit(lambda k: generate_scene(k, sc))(key)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
    np.testing.assert_array_equal(np.asarray(polys), np.asarray(polys2))
    img, polys, n_verts, class_ids = jax.device_get(
        (img, polys, n_verts, class_ids)
    )
    assert img.shape == (96, 96) and img.dtype == np.float32
    assert img.min() >= 0.0 and img.max() <= 255.0
    n = int((n_verts > 0).sum())
    assert 1 <= n <= 3
    for p in range(4):
        if n_verts[p]:
            assert n_verts[p] == 4
            assert 1 <= class_ids[p] <= len(sc.class_names)
            pts = polys[p, :4]
            assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 96
            assert pts[:, 1].min() >= 0 and pts[:, 1].max() <= 96
            # the object must actually be rendered: its interior should
            # contain dark (module) pixels on the light background
            cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
            y0, y1 = int(max(0, cy - 8)), int(min(96, cy + 8))
            x0, x1 = int(max(0, cx - 8)), int(min(96, cx + 8))
            assert img[y0:y1, x0:x1].min() < 140, (
                f"object {p} region has no dark texture"
            )


@pytest.mark.slow  # 27 s (4 compile seeds); invariant also exercised by the transfer test
def test_objects_disjoint():
    """Grid-cell placement must keep object AABBs pairwise disjoint (the
    separable-components invariant of the host generator)."""
    sc = SynthConfig(hw=(128, 128), n_objects=(4, 4), max_polys=4)
    for seed in range(4):
        _, polys, n_verts, _ = jax.device_get(
            jax.jit(lambda k: generate_scene(k, sc))(jax.random.PRNGKey(seed))
        )
        boxes = []
        for p in range(4):
            if n_verts[p]:
                pts = polys[p, :4]
                boxes.append(
                    (pts[:, 0].min(), pts[:, 1].min(),
                     pts[:, 0].max(), pts[:, 1].max())
                )
        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                a, b = boxes[i], boxes[j]
                overlap = not (
                    a[2] <= b[0] or b[2] <= a[0]
                    or a[3] <= b[1] or b[3] <= a[1]
                )
                assert not overlap, f"objects {i},{j} overlap: {a} {b}"


def test_1d_duty_signature_matches_host():
    """The dark fraction (duty cycle) of the stripe field — a per-class
    cue — must match the host renderer for the same class."""
    from ubdvss_tpu.synthgen import _texel_1d
    from ubdvss_tpu.synthetic import _render_barcode

    names = ("EAN13", "Code93", "Codabar")
    tables = {
        k: jnp.asarray(v) for k, v in build_class_tables(names).items()
    }
    rng = np.random.default_rng(0)
    for c, name in enumerate(names):
        bw, bh = 96.0, 40.0
        vv, uu = jnp.mgrid[0:40, 0:96]
        dark = _texel_1d(
            uu.astype(jnp.float32), vv.astype(jnp.float32),
            bw, bh, tables["module"][c], 0, tables, c,
        )
        host = _render_barcode(rng, 96, 40, "1D", name)
        dev_frac = float(jnp.mean(dark))
        host_frac = float((host < 128).mean())
        assert abs(dev_frac - host_frac) < 0.12, (
            f"{name}: device dark frac {dev_frac:.3f} vs host {host_frac:.3f}"
        )


def test_identity_affine_reproduces_no_affine_scene():
    """Composed-affine rendering with the identity matrix must be exactly
    the no-affine scene (validates the coordinate composition end to end:
    shrink cap, window placement, inverse mapping, coverage blend)."""
    sc = SynthConfig(hw=(128, 128), n_objects=(2, 4), max_polys=4)
    ident = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    for seed in (0, 5):
        key = jax.random.PRNGKey(seed)
        img0, polys0, nv0, ci0 = jax.device_get(
            jax.jit(lambda k: generate_scene(k, sc))(key)
        )
        img1, polys1, nv1, ci1 = jax.device_get(
            jax.jit(lambda k, m: generate_scene(k, sc, affine=m))(key, ident)
        )
        np.testing.assert_allclose(polys1, polys0, atol=1e-4)
        np.testing.assert_array_equal(nv1, nv0)
        np.testing.assert_array_equal(ci1, ci0)
        np.testing.assert_allclose(img1, img0, atol=1e-3)


def test_affine_transforms_polys_and_content():
    """A pure translation composed into the render must shift the GT
    polygons exactly and move the rendered texture with them."""
    sc = SynthConfig(hw=(160, 160), n_objects=(2, 2), max_polys=4)
    t = jnp.array([[1.0, 0.0, 9.0], [0.0, 1.0, -13.0]])
    key = jax.random.PRNGKey(11)
    img0, polys0, nv0, _ = jax.device_get(
        jax.jit(lambda k: generate_scene(k, sc))(key)
    )
    img1, polys1, nv1, _ = jax.device_get(
        jax.jit(lambda k, m: generate_scene(k, sc, affine=m))(key, t)
    )
    np.testing.assert_array_equal(nv1, nv0)
    shift = np.array([9.0, -13.0], np.float32)
    np.testing.assert_allclose(
        polys1[nv1 > 0][:, :4], polys0[nv0 > 0][:, :4] + shift, atol=1e-4
    )
    # texture present at each translated object center
    for p in range(4):
        if nv1[p]:
            cx, cy = polys1[p, :4, 0].mean(), polys1[p, :4, 1].mean()
            y0, y1 = int(max(0, cy - 8)), int(min(160, cy + 8))
            x0, x1 = int(max(0, cx - 8)), int(min(160, cx + 8))
            assert img1[y0:y1, x0:x1].min() < 140


def test_affine_rotation_scale_objects_fit_and_render():
    """A rotation+downscale similarity: polys stay consistent (exact
    rotated rects of the drawn sizes), out-of-frame background becomes
    fill, and dark texture lands inside every transformed poly."""
    from ubdvss_tpu.ops.augment import AugmentConfig, random_affine

    sc = SynthConfig(hw=(192, 192), n_objects=(3, 3), max_polys=4)
    acfg = AugmentConfig(rotation_deg=25.0, scale_range=(0.75, 0.75),
                         translate_frac=0.0)
    m = random_affine(jax.random.PRNGKey(2), acfg, sc.hw)
    img, polys, nv, _ = jax.device_get(
        jax.jit(lambda k, mm: generate_scene(k, sc, affine=mm))(
            jax.random.PRNGKey(4), m
        )
    )
    # downscale 0.75 about the center leaves a fill border
    assert img[0, 0] > 250.0 and img[-1, -1] > 250.0
    for p in range(4):
        if nv[p]:
            cx, cy = polys[p, :4, 0].mean(), polys[p, :4, 1].mean()
            y0, y1 = int(max(0, cy - 6)), int(min(192, cy + 6))
            x0, x1 = int(max(0, cx - 6)), int(min(192, cx + 6))
            assert img[y0:y1, x0:x1].min() < 140, (
                f"object {p} has no texture at its transformed position"
            )


def test_synth_batch_step_augmented_contract():
    """The fused synth+augment batch step returns the batch contract and
    per-epoch variation; segmap components must line up with the polys."""
    from ubdvss_tpu.synthgen import synth_batch_step

    cfg = NetConfig(max_components=4)
    dc = DataConfig(batch_size=2, train_hw=(96, 96), max_polys=4)
    sc = SynthConfig(hw=(96, 96), n_objects=(1, 3), max_polys=4)
    b = jax.device_get(
        synth_batch_step(jax.random.PRNGKey(0), sc, cfg, dc, True)
    )
    assert b["images"].shape == (2, 96, 96, 1)
    assert b["segmap"].shape == (2, 24, 24)
    assert np.abs(b["images"]).max() <= 1.0 + 1e-6
    # every active poly must rasterize some pixels of its class (polys
    # fully inside the frame; clipped ones may legitimately vanish)
    for i in range(2):
        for p in range(4):
            if b["n_verts"][i, p]:
                pts = b["polys"][i, p, :4] / cfg.scale
                if (pts.min() >= 0 and pts[:, 0].max() < 24
                        and pts[:, 1].max() < 24):
                    cid = b["class_ids"][i, p]
                    assert (b["segmap"][i] == cid).any()


def test_batches_contract_and_train_step():
    from ubdvss_tpu.train import create_train_state, train_step

    cfg = NetConfig(max_components=4)
    dc = DataConfig(batch_size=2, train_hw=(64, 64), max_polys=4)
    batches = DeviceSyntheticBatches(cfg, dc, n_samples=4, seed=1)
    assert len(batches) == 2
    state = create_train_state(cfg, lr=1e-3)
    got = 0
    for batch in batches.epoch(0):
        assert set(batch) == {
            "images", "segmap", "polys", "n_verts", "class_ids"
        }
        assert batch["images"].shape == (2, 64, 64, 1)
        assert batch["segmap"].shape == (2, 16, 16)
        state, m = train_step(state, batch, cfg)
        got += 1
    assert got == 2
    assert np.isfinite(float(m["loss"]))
    # a fresh epoch key produces different scenes
    b0 = next(iter(batches.epoch(0)))
    b1 = next(iter(batches.epoch(1)))
    assert not np.array_equal(np.asarray(b0["images"]), np.asarray(b1["images"]))


@pytest.mark.slow
def test_pretrained_asset_transfers_to_device_scenes():
    """Cross-generator transfer: the host-trained dense asset must detect
    and classify device-generated scenes (class-signature consistency)."""
    import os

    from ubdvss_tpu.evaluate import _collect_batch, evaluate_detections
    from ubdvss_tpu.inference import detect_program_batch
    from ubdvss_tpu.utils.checkpoint import load_params_npz

    cfg = NetConfig(max_components=8, separable_context=False)
    params = load_params_npz(
        os.path.join(os.path.dirname(__file__), "..", "assets",
                     "pretrained_dense_synthetic.npz"),
        init_params(cfg, 0),
    )
    # 256px: the cell-placement size range matches the host generator's
    # (at 128px cells clamp objects below the host size distribution and
    # recall drops — measured F1 1.0/acc 0.865 @256 vs 0.86/0.77 @128)
    sc = SynthConfig(hw=(256, 256), n_objects=(1, 3), max_polys=4)
    gen = jax.jit(jax.vmap(lambda k: generate_scene(k, sc)))
    imgs, polys, n_verts, class_ids = jax.device_get(
        gen(jax.random.split(jax.random.PRNGKey(7), 16))
    )
    res, _ = detect_program_batch(
        params, jnp.asarray(imgs), cfg, (256, 256), fused=False
    )
    per_image: list[dict] = []
    _collect_batch(per_image, res, polys, n_verts, class_ids)
    r = evaluate_detections(per_image, class_names=cfg.class_names)
    assert r.f1 >= 0.95, f"transfer F1 too low: {r.f1:.3f}"
    assert r.class_accuracy >= 0.75, (
        f"transfer class accuracy too low: {r.class_accuracy:.3f}"
    )
