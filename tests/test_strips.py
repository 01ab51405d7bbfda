"""Strip-tiled trunk (ops/strips.py): reassembled logits must equal the
whole-image forward exactly — same receptive-field contract as the
multi-chip halo exchange, here within one chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubdvss_tpu.models.model import get_model, init_params
from ubdvss_tpu.net_config import NetConfig
from ubdvss_tpu.ops.strips import auto_n_strips, strip_plan, strip_tiled_logits
from ubdvss_tpu.parallel.tiling import receptive_field_halo

CPU = jax.devices("cpu")[0]


def test_strip_plan_covers_and_aligns():
    H, scale, halo, S = 2048, 4, 140, 4
    plan = strip_plan(H, scale, halo, S)
    hs, win = H // S, H // S + 2 * halo
    for s, (start, off) in enumerate(plan):
        assert start % scale == 0 and off % scale == 0
        assert 0 <= start <= H - win
        assert start + off == s * hs  # core lands at its true position
        assert off + hs <= win  # core fits in the window
    assert plan[0] == (0, 0)  # top edge clamped to the real boundary
    assert plan[-1][0] == H - win  # bottom edge clamped


def test_auto_n_strips():
    assert auto_n_strips(2048, 4, 140) == 4
    assert auto_n_strips(1024, 4, 140) == 2
    assert auto_n_strips(512, 4, 140) == 1  # window would exceed the image


@pytest.mark.parametrize("separable", [True, False])
def test_strip_tiled_logits_match_full(separable):
    with jax.default_device(CPU):
        cfg = NetConfig(dilations=(1, 2), separable_context=separable)
        halo = receptive_field_halo(cfg)  # 4 * (3 + 2) = 20
        params = init_params(cfg, 0)
        model = get_model(cfg)
        trunk = lambda s: model.apply({"params": params}, s)
        # content everywhere incl. hard edges so boundary semantics are
        # exercised (SAME zero-padding at the true image edge)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 64, 1)).astype(np.float32))
        full = trunk(x)
        tiled = strip_tiled_logits(trunk, x, cfg.scale, halo, 2)
        assert tiled.shape == full.shape
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-5)


def test_tile_2d_logits_match_full():
    from ubdvss_tpu.ops.strips import tile_2d_logits

    with jax.default_device(CPU):
        cfg = NetConfig(dilations=(1, 2))
        halo = receptive_field_halo(cfg)
        params = init_params(cfg, 0)
        model = get_model(cfg)
        trunk = lambda s: model.apply({"params": params}, s)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 160, 128, 1)).astype(np.float32))
        full = trunk(x)
        for grid in [(2, 1), (1, 2), (2, 2)]:
            tiled = tile_2d_logits(trunk, x, cfg.scale, halo, grid)
            assert tiled.shape == full.shape
            np.testing.assert_allclose(
                np.asarray(tiled), np.asarray(full), atol=1e-5,
                err_msg=f"grid={grid}",
            )


@pytest.mark.parametrize("raw_gray", [False, True])
def test_two_stage_tiled_trunk_matches_fused(raw_gray):
    """Per-stage 2-D tiling (stem halo 4, context halo sum(dilations)) must
    reproduce the untiled fused forward exactly, including clamped edge
    tiles and the raw-gray normalization fold."""
    from ubdvss_tpu.ops.pallas.context_kernel import fused_model_apply
    from ubdvss_tpu.ops.strips import two_stage_tiled_trunk

    with jax.default_device(CPU):
        cfg = NetConfig(dilations=(1, 2))
        params = init_params(cfg, 0)
        rng = np.random.default_rng(3)
        lo, hi = (0.0, 255.0) if raw_gray else (-1.0, 1.0)
        x = jnp.asarray(rng.uniform(lo, hi, (2, 128, 64, 1)).astype(np.float32))
        full = fused_model_apply(params, x, cfg, raw_gray=raw_gray)
        tiled = two_stage_tiled_trunk(
            params, x, cfg, (2, 2), (2, 2), raw_gray=raw_gray
        )
        assert tiled.shape == full.shape
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-5)


def test_auto_two_stage_grids():
    from ubdvss_tpu.ops.strips import auto_two_stage_grids

    dil = (1, 1, 2, 4, 8, 16, 1)
    stem_grid, ctx_grid = auto_two_stage_grids(2048, 2048, 4, dil)
    assert stem_grid == (4, 1)  # row strips only (column tiling measured slower)
    assert ctx_grid == (1, 1)  # context handled by the s2d route, not tiling
    # small images don't tile
    assert auto_two_stage_grids(256, 256, 4, dil) == ((1, 1), (1, 1))


@pytest.mark.slow
def test_detect_preprocessed_batch_strips_match():
    from ubdvss_tpu.inference import detect_preprocessed_batch

    with jax.default_device(CPU):
        cfg = NetConfig(dilations=(1, 2))
        params = init_params(cfg, 0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 64, 1)).astype(np.float32))
        res1, log1 = detect_preprocessed_batch(params, x, cfg, fused=False)
        res2, log2 = detect_preprocessed_batch(
            params, x, cfg, fused=False, n_strips=2
        )
        np.testing.assert_allclose(np.asarray(log2), np.asarray(log1), atol=1e-5)
        for k in res1:
            np.testing.assert_array_equal(np.asarray(res1[k]), np.asarray(res2[k]))


def test_packed_trunk_tile_grid_selection():
    """Trunk-level tiling engages only at >=4096px per axis; halo stays
    a multiple of 8 (s2d/scale alignment)."""
    from ubdvss_tpu.ops.strips import packed_trunk_tile_grid

    cfg = NetConfig()
    halo, grid = packed_trunk_tile_grid(2048, 2048, cfg)
    assert grid == (1, 1)
    assert halo % 8 == 0
    halo, grid = packed_trunk_tile_grid(4096, 4096, cfg)
    assert grid[0] > 1 and grid[1] > 1
    # elongated: only the long axis tiles
    _, grid = packed_trunk_tile_grid(4096, 2048, cfg)
    assert grid[0] > 1 and grid[1] == 1


@pytest.mark.tpu
@pytest.mark.slow
def test_packed_trunks_tiled_exact_tpu():
    """Trunk-level tiled packed trunks (bf16 + int8) reproduce the
    untiled packed trunks exactly at a forced (2, 2) grid on 1024^2
    input — the receptive-field-halo exactness argument, checked on the
    real lowering (the tiling exists to dodge XLA's >=4096px space-to-
    batch relayouts; see strips.packed_trunk_tile_grid)."""
    import jax.numpy as jnp

    from ubdvss_tpu.ops.pallas.context_kernel import packed_fused_trunk
    from ubdvss_tpu.ops.quant import (
        int8_packed_trunk_apply,
        int8_packed_trunk_tiled,
        quantize_trunk,
    )
    from ubdvss_tpu.ops.strips import packed_fused_trunk_tiled
    from ubdvss_tpu.synthetic import SyntheticMarkupReader

    cfg = NetConfig(dtype="bfloat16")
    params = init_params(cfg, 0)
    reader = SyntheticMarkupReader(n_samples=1, image_hw=(1024, 1024), seed=3)
    x = jnp.asarray(np.asarray(reader.sample_at(0).image, np.float32))[None]

    a = packed_fused_trunk(params, x[..., None], cfg, raw_gray=True,
                           act_out=True)
    b = packed_fused_trunk_tiled(params, x[..., None], cfg, raw_gray=True,
                                 grid=(2, 2))
    # bf16: tile-vs-whole conv reduction order differs at the last ulp
    # (measured max abs 6e-5, scattered, not at seams); int8 below is
    # exact-integer and therefore bit-identical
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-3
    )

    cfg32 = NetConfig()
    q = quantize_trunk(init_params(cfg32, 0), cfg32, x[..., None] / 127.5 - 1)
    qa = int8_packed_trunk_apply(q, x, cfg32, raw_gray=True)
    qb = int8_packed_trunk_tiled(q, x, cfg32, raw_gray=True, grid=(2, 2))
    np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
