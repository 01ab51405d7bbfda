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
