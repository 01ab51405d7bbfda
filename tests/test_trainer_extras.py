"""Trainer auxiliary subsystems: schedules, best-checkpoint, checkify,
visualization (SURVEY.md §5)."""

import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ubdvss_tpu import NetConfig
from ubdvss_tpu.data import Batches, DataConfig
from ubdvss_tpu.synthetic import SyntheticMarkupReader
from ubdvss_tpu.train import (
    Trainer,
    checked_train_step,
    create_train_state,
    make_lr_schedule,
    train_step,
)
from ubdvss_tpu.utils.visualization import (
    detection_summary_image,
    draw_detections,
    heatmap_overlay,
)


def test_lr_schedules():
    s = make_lr_schedule("constant", 1e-3)
    assert float(s(0)) == pytest.approx(1e-3)
    c = make_lr_schedule("cosine", 1e-3, warmup_steps=10, decay_steps=100)
    assert float(c(0)) == 0.0
    assert float(c(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(c(110)) < 1e-4
    e = make_lr_schedule("exponential", 1e-3, decay_steps=100)
    assert float(e(100)) == pytest.approx(1e-5, rel=1e-3)
    with pytest.raises(ValueError):
        make_lr_schedule("nope", 1e-3)


def _tiny_batch(cfg):
    reader = SyntheticMarkupReader(n_samples=2, image_hw=(32, 32), seed=0)
    dc = DataConfig(batch_size=2, train_hw=(32, 32), augment=None)
    return next(iter(Batches(reader, cfg, dc, train=True).epoch(0)))


@pytest.mark.slow
def test_checked_train_step_clean_and_poisoned():
    cfg = NetConfig()
    batch = _tiny_batch(cfg)
    state = create_train_state(cfg, lr=1e-3)
    err, (new_state, metrics) = checked_train_step(state, batch, cfg)
    err.throw()  # no error on clean data
    assert float(metrics["loss"]) > 0
    # poison the params -> NaN must be caught
    bad = state.replace(params=jax.tree.map(lambda p: p * jnp.nan, state.params))
    err, _ = checked_train_step(bad, batch, cfg)
    with pytest.raises(Exception):
        err.throw()


@pytest.mark.slow
def test_best_checkpoint_and_image_summary(tmp_path):
    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=4, image_hw=(32, 32), seed=1)
    dc = DataConfig(batch_size=2, train_hw=(32, 32), augment=None)
    tr = Trainer(
        cfg, dc, lr=1e-3, logdir=str(tmp_path), checkpoint_every=2,
        best_metric="pixel_f1", image_summaries=True,
    )
    batches = Batches(reader, cfg, dc, train=True)
    val = Batches(reader, cfg, dc, train=False)
    tr.fit(batches, epochs=2, val_batches=val)
    assert tr.best_ckpt.best_step() is not None
    assert (tmp_path / "metrics.jsonl").exists()
    # export_params returns the best-ranked checkpoint's params (the
    # ModelCheckpoint save_best_only analog behind train --export-npz)
    best = tr.export_params()
    want = tr.best_ckpt.restore(
        jax.device_get(tr.state), tr.best_ckpt.best_step()
    ).params
    assert all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(best), jax.tree.leaves(want))
    )
    final = tr.export_params(prefer_best=False)
    assert all(
        np.array_equal(a, b)
        for a, b in zip(
            jax.tree.leaves(final), jax.tree.leaves(jax.device_get(tr.state.params))
        )
    )


def test_visualization_helpers():
    img = np.zeros((32, 32), np.uint8)
    box = np.array([[[4, 4], [20, 4], [20, 12], [4, 12]]], np.float32)
    out = draw_detections(img, box, gt_polygons=[box[0] + 2])
    assert out.shape == (32, 32, 3)
    assert (out != 0).any()
    hm = np.zeros((8, 8), np.float32)
    hm[2:4, 2:4] = 1.0
    ov = heatmap_overlay(img, hm)
    assert ov.shape == (32, 32, 3)
    assert ov[9, 9, 0] > 100  # red where heatmap fires
    res = {
        "valid": np.array([True]),
        "boxes": box,
    }
    s = detection_summary_image(img, res)
    assert s.shape == (32, 32, 3)


def test_net_config_sidecar_roundtrip(tmp_path):
    """Trainer persists net_config.json; evaluate/detect rebuild the exact
    trained architecture from it (round 2: --channels/--dilations/
    --no-separable-context become checkpoint-portable)."""
    from ubdvss_tpu.utils.checkpoint import load_net_config

    cfg = NetConfig(channels=16, dilations=(1, 2), separable_context=False)
    dc = DataConfig(batch_size=2, train_hw=(64, 64), augment=None)
    Trainer(cfg, dc, logdir=str(tmp_path / "run"))
    got = load_net_config(tmp_path / "run")
    assert got == cfg
    # also resolvable from the checkpoints subdir and an npz path inside
    assert load_net_config(tmp_path / "run" / "checkpoints") == cfg
    assert load_net_config(tmp_path / "run" / "weights.npz") == cfg
    assert load_net_config(tmp_path) is None


@pytest.mark.slow
def test_train_cli_architecture_flags(tmp_path):
    """--channels/--dilations/--no-separable-context reach NetConfig and the
    sidecar; a fresh evaluate run picks the architecture up from the logdir."""
    from ubdvss_tpu import evaluate as eval_mod
    from ubdvss_tpu import train as train_mod

    logdir = str(tmp_path / "run")
    tr = train_mod.main([
        "--train-data", "synthetic", "--epochs", "1", "--batch-size", "2",
        "--synthetic-samples", "2", "--train-size", "64", "64",
        "--no-augment", "--logdir", logdir,
        "--channels", "12", "--dilations", "1", "2",
        "--no-separable-context",
    ])
    assert tr.cfg.channels == 12
    assert tr.cfg.dilations == (1, 2)
    assert not tr.cfg.separable_context
    res = eval_mod.main([
        "--data", "synthetic", "--checkpoint", logdir,
        "--synthetic-samples", "2", "--image-size", "64", "64",
        "--batch-size", "2",
    ])
    assert res.n_images == 2


def test_train_bf16_mixed_precision():
    """--dtype bfloat16: bf16 trunk on the forward/backward, f32 master
    weights preserved through the optimizer update, finite loss."""
    import jax
    import jax.numpy as jnp

    from ubdvss_tpu import NetConfig
    from ubdvss_tpu.data import Batches, DataConfig
    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.train import build_argparser, create_train_state, train_step

    args = build_argparser().parse_args(
        ["--train-data", "synthetic", "--dtype", "bfloat16"]
    )
    assert args.dtype == "bfloat16"

    cfg = NetConfig(dtype="bfloat16")
    reader = SyntheticMarkupReader(n_samples=4, image_hw=(64, 64), seed=0)
    dc = DataConfig(batch_size=4, train_hw=(64, 64), augment=None)
    batch = next(iter(Batches(reader, cfg, dc, train=True).epoch(0)))
    state = create_train_state(cfg, lr=1e-3)
    state, metrics = train_step(state, batch, cfg)
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32  # master weights stay f32


def test_cls_weight_schedule():
    """cls_schedule ramps the classification-loss weight from base to end
    over ramp_steps (computed on device from state.step), and the total
    loss reflects the scheduled weight exactly."""
    from ubdvss_tpu.train import create_train_state, train_step

    cfg = NetConfig(class_names=("A", "B"), classification_loss_weight=0.5)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
        "segmap": jnp.asarray(rng.integers(0, 3, size=(2, 8, 8)).astype(np.int32)),
    }
    sched = jnp.asarray([0.5, 4.5, 4.0], jnp.float32)  # base, end, ramp

    state = create_train_state(cfg, lr=0.0)  # lr 0: params frozen
    losses, weights = [], []
    for _ in range(6):
        state, m = train_step(state, batch, cfg, sched)
        losses.append(float(m["loss"]))
        weights.append(float(m["cls_weight"]))
        det = float(m["detection_loss"])
        cls = float(m["classification_loss"])
        assert abs(float(m["loss"]) - (det + weights[-1] * cls)) < 1e-5
    # step 0..5 -> weight 0.5 + 4.0 * min(step/4, 1)
    expect = [0.5 + 4.0 * min(s / 4.0, 1.0) for s in range(6)]
    np.testing.assert_allclose(weights, expect, rtol=1e-6)
    assert losses[0] < losses[4]  # params frozen, weight grew -> loss grew
    # constant mode: no cls_weight metric, loss uses cfg weight
    state2 = create_train_state(cfg, lr=0.0)
    _, m2 = train_step(state2, batch, cfg)
    assert "cls_weight" not in m2
    assert abs(
        float(m2["loss"])
        - (float(m2["detection_loss"]) + 0.5 * float(m2["classification_loss"]))
    ) < 1e-6


@pytest.mark.slow  # ~60 s; checkify+GSPMD composition, release-gate tier
def test_checked_train_step_under_mesh():
    """checkify + GSPMD data parallelism compose (VERDICT r2 weak #7):
    the debug-guarded step must run under a sharded mesh and match the
    single-device loss; a poisoned batch must still throw.

    Runs in a FRESH SUBPROCESS: compiling this checkify+GSPMD program
    late in a long-lived pytest process segfaults XLA:CPU's
    backend_compile (reproduced 3x at ~200 compiled executables into the
    full -m "" suite, 2026-08-21; passes standalone and in every module
    subset).  Process isolation sidesteps the upstream crash without
    weakening the check."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from test_trainer_extras import checked_under_mesh_body; "
         "checked_under_mesh_body()" % str(Path(__file__).parent)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ,
             "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()},
    )
    assert res.returncode == 0, res.stderr[-2000:]


def checked_under_mesh_body():
    """Body of test_checked_train_step_under_mesh (subprocess target)."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        _checked_under_mesh_impl()


def _checked_under_mesh_impl():
    import pytest

    from ubdvss_tpu.parallel.mesh import (
        make_mesh,
        replicate_to_mesh,
        shard_batch_to_mesh,
    )
    from ubdvss_tpu.train import checked_train_step, create_train_state

    cfg = NetConfig(class_names=("A", "B"))
    rng = np.random.default_rng(1)
    batch = {
        "images": jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32)),
        "segmap": jnp.asarray(rng.integers(0, 3, size=(8, 8, 8)).astype(np.int32)),
    }
    state1 = create_train_state(cfg, lr=1e-3)
    err, (_, m1) = checked_train_step(state1, batch, cfg)
    err.throw()

    mesh = make_mesh(4, axis="data", devices=jax.devices("cpu"))
    state4 = replicate_to_mesh(create_train_state(cfg, lr=1e-3), mesh)
    sharded = shard_batch_to_mesh(dict(batch), mesh)
    err, (_, m4) = checked_train_step(state4, sharded, cfg)
    err.throw()
    assert abs(float(m1["loss"]) - float(m4["loss"])) < 1e-5

    bad = dict(sharded)
    bad["images"] = sharded["images"].at[0, 0, 0, 0].set(jnp.nan)
    err, _ = checked_train_step(
        replicate_to_mesh(create_train_state(cfg, lr=1e-3), mesh), bad, cfg
    )
    with pytest.raises(Exception):
        err.throw()


def test_fused_synth_step_matches_unfused_stream():
    """Trainer's fused synth+train program must walk the exact same
    sample/key stream as the unfused DeviceSyntheticBatches loop —
    identical params after two epochs."""
    from ubdvss_tpu.data import DataConfig
    from ubdvss_tpu.synthgen import DeviceSyntheticBatches
    from ubdvss_tpu.train import Trainer, create_train_state, train_step

    cfg = NetConfig(max_components=4)
    dc = DataConfig(batch_size=2, train_hw=(64, 64), max_polys=4, seed=3)
    batches = DeviceSyntheticBatches(cfg, dc, n_samples=4, seed=5)

    tr = Trainer(cfg, dc, lr=1e-3, seed=0)
    tr.fit(batches, epochs=2)

    # multi-step dispatch (lax.scan chunking) must walk the same stream
    tr2 = Trainer(cfg, dc, lr=1e-3, seed=0, steps_per_dispatch=2)
    tr2.fit(batches, epochs=2)

    state = create_train_state(cfg, lr=1e-3, seed=0)
    for epoch in range(2):
        for batch in batches.epoch(epoch):
            state, _ = train_step(state, batch, cfg)

    for got in (tr.state.params, tr2.state.params):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            ),
            jax.device_get(got), jax.device_get(state.params),
        )


def test_fused_cached_step_matches_unfused_stream():
    from ubdvss_tpu.data import DataConfig, DeviceCachedBatches
    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.train import Trainer, create_train_state, train_step

    cfg = NetConfig(max_components=4)
    dc = DataConfig(batch_size=2, train_hw=(64, 64), max_polys=4, seed=1)
    reader = SyntheticMarkupReader(n_samples=4, image_hw=(64, 64), seed=9)
    batches = DeviceCachedBatches(reader, cfg, dc, train=True)

    tr = Trainer(cfg, dc, lr=1e-3, seed=0)
    tr.fit(batches, epochs=2)

    state = create_train_state(cfg, lr=1e-3, seed=0)
    for epoch in range(2):
        for batch in batches.epoch(epoch):
            state, _ = train_step(state, batch, cfg)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        jax.device_get(tr.state.params), jax.device_get(state.params),
    )
