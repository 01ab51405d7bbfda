"""Mesh sharding + halo-exchange tiling tests on 8 virtual CPU devices
(SURVEY.md §4.5 — the standard JAX substitute for multi-node fixtures)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ubdvss_tpu import NetConfig, init_params
from ubdvss_tpu.data import Batches, DataConfig
from ubdvss_tpu.inference import detect_program
from ubdvss_tpu.ops.ccl import connected_components
from ubdvss_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch_to_mesh,
)
from ubdvss_tpu.parallel.tiling import (
    distributed_connected_components,
    receptive_field_halo,
    tiled_detect,
)
from ubdvss_tpu.synthetic import SyntheticMarkupReader
from ubdvss_tpu.train import create_train_state, train_step


def _cpu_mesh(n, axis):
    return make_mesh(n, axis=axis, devices=jax.devices("cpu"))


def test_dp_train_step_matches_single_device():
    """Sharded-batch gradients must equal single-device gradients."""
    cfg = NetConfig()
    reader = SyntheticMarkupReader(n_samples=8, image_hw=(64, 64), seed=0)
    dc = DataConfig(batch_size=8, train_hw=(64, 64), augment=None, shuffle=False)
    batch = next(iter(Batches(reader, cfg, dc, train=True).epoch(0)))

    state1 = create_train_state(cfg, lr=1e-3)
    s1, m1 = train_step(state1, batch, cfg)

    mesh = _cpu_mesh(4, "data")
    state2 = replicate_to_mesh(create_train_state(cfg, lr=1e-3), mesh)
    sharded = shard_batch_to_mesh(batch, mesh)
    s2, m2 = train_step(state2, sharded, cfg)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _partition_equal(ours, theirs):
    if not np.array_equal(ours > 0, theirs > 0):
        return False
    fg = ours > 0
    if not fg.any():
        return True
    pairs = set(zip(ours[fg].tolist(), theirs[fg].tolist()))
    return len(pairs) == len(set(ours[fg])) == len(set(theirs[fg]))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("connectivity", [4, 8])
def test_distributed_ccl_matches_single(n_dev, connectivity):
    """Cross-tile CC merge == single-device CCL, incl. seam-snaking comps."""
    H = W = 32
    rng = np.random.default_rng(0)
    cases = [rng.random((H, W)) < d for d in (0.3, 0.5, 0.7)]
    # long snake crossing every seam several times
    snake = np.zeros((H, W), bool)
    for c in range(0, W, 4):
        snake[:, c] = True
        snake[0 if (c // 4) % 2 else H - 1, c : c + 5] = True
    cases.append(snake)
    single = np.zeros((H, W), bool)
    single[15, 15] = True  # exactly on a seam for n=2
    cases.append(single)
    mesh = _cpu_mesh(n_dev, "spatial")
    for mask in cases:
        ref, _ = connected_components(jnp.asarray(mask), connectivity=connectivity)
        got = distributed_connected_components(
            jnp.asarray(mask), mesh, connectivity=connectivity
        )
        # identical labels, not just same partition: both use the
        # raster-order-of-root compaction rule
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("n_dev", [2, 4])
def test_tiled_logits_match_whole_image(n_dev):
    """Halo-exchanged tiled FCN heatmap == whole-image heatmap (<=1e-4)."""
    cfg = NetConfig(dilations=(1, 2, 4), max_components=16)
    params = init_params(cfg, 1)
    H = W = 192
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (H, W), dtype=np.uint8)
    _, ref_logits = detect_program(params, jnp.asarray(img), cfg, (H, W))
    mesh = _cpu_mesh(n_dev, "spatial")
    assert receptive_field_halo(cfg) <= H // n_dev
    res = tiled_detect(params, jnp.asarray(img), cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(res["logits"]), np.asarray(ref_logits), atol=1e-4
    )


def test_trained_tiled_detection_seam_exact():
    """Train briefly, then tiled and whole-image detections must agree
    box-for-box (SURVEY.md §7 hard part 5)."""
    cfg = NetConfig(dilations=(1, 2, 4), max_components=16, min_component_area=4)
    reader = SyntheticMarkupReader(n_samples=8, image_hw=(128, 128), seed=4)
    dc = DataConfig(batch_size=8, train_hw=(128, 128), augment=None)
    state = create_train_state(cfg, lr=2e-3)
    batches = Batches(reader, cfg, dc, train=True)
    for epoch in range(40):
        for b in batches.epoch(epoch):
            state, m = train_step(state, b, cfg)
    params = jax.device_get(state.params)
    mesh = _cpu_mesh(4, "spatial")
    n_checked = 0
    for i in range(4):
        img = reader.sample_at(i).image
        ref, _ = detect_program(params, jnp.asarray(img), cfg, (128, 128))
        ref = jax.device_get(ref)
        res = jax.device_get(tiled_detect(params, jnp.asarray(img), cfg, mesh))
        np.testing.assert_array_equal(ref["valid"], res["valid"])
        np.testing.assert_allclose(ref["boxes"], res["boxes"], atol=1e-3)
        n_checked += int(ref["num_detections"])
    assert n_checked >= 2  # the comparison was not vacuous
