"""Single-chip strip-tiled trunk execution for large scans.

XLA's conv emitter is measured ~3.7x slower PER PIXEL on large spatial
feature maps (H=512) than small ones (H=128) at equal total pixel count
(BASELINE.md, round 2) — the one remaining gap on 2048x2048 document scans
(BASELINE config 4).  Per-conv space-to-batch rewrites were measured no
better (the layout transposes eat the conv gain).  This module instead
tiles at the IMAGE level: slice the batch into overlapping row strips whose
overlap covers the FCN receptive field, run the UNCHANGED stem+context
trunk on the (S*B)-strip batch — where every conv sees small-spatial
inputs — then crop each strip's logits to its core rows and reassemble.
Only row slices and concats are added; no transposes, no per-layer rewrite.

Exactness: a SAME-padded FCN output pixel depends only on inputs within the
receptive field, so core outputs of a strip with >= RF-sized overlap equal
the full-image outputs bit-for-bit wherever the strip window lies inside
the image; edge strips are CLAMPED to the image boundary (window start
pinned to row 0 / H-win) so the model's own SAME zero-padding is applied at
the true image edge, reproducing boundary semantics exactly.  This is the
same receptive-field accounting as the multi-chip halo exchange
(parallel/tiling.py:receptive_field_halo), reused here within one chip.
Guarded by tests/test_strips.py (strip-tiled == full logits).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax


def strip_plan(H: int, scale: int, halo: int, n_strips: int) -> list[tuple[int, int]]:
    """Per-strip (window_start, core_offset) pairs; all multiples of scale.

    Every window has the same height ``H // n_strips + 2 * halo`` so strips
    batch into one array; edge windows are clamped into the image, which
    shifts their core offset instead.
    """
    if H % (n_strips * scale):
        raise ValueError(f"H={H} not divisible by n_strips*scale")
    if halo % scale:
        raise ValueError(f"halo={halo} not a multiple of scale={scale}")
    hs = H // n_strips
    win = hs + 2 * halo
    if win >= H:
        raise ValueError(f"strip window {win} >= image height {H}")
    plan = []
    for s in range(n_strips):
        start = min(max(s * hs - halo, 0), H - win)
        plan.append((start, s * hs - start))
    return plan


def strip_tiled_logits(
    trunk: Callable,
    x,
    scale: int,
    halo: int,
    n_strips: int,
    axis: int = 1,
):
    """Run ``trunk`` ((B', h, w[, C]) images -> (B', h/scale, w/scale, O)
    logits, SAME padding) over strips of ``x`` along ``axis`` (1 = rows,
    2 = columns) and reassemble logits identical to ``trunk(x)``.

    ``x``: (B, H, W) or (B, H, W, C); size along ``axis`` divisible by
    n_strips*scale.
    """
    B, H = x.shape[0], x.shape[axis]
    plan = strip_plan(H, scale, halo, n_strips)
    hs = H // n_strips
    win = hs + 2 * halo
    strips = jnp.concatenate(
        [lax.slice_in_dim(x, st, st + win, axis=axis) for st, _ in plan],
        axis=0,
    )
    y = trunk(strips)  # (S*B, ..., win/scale, ..., O)
    cores = [
        lax.slice_in_dim(
            lax.slice_in_dim(y, s * B, (s + 1) * B, axis=0),
            off // scale,
            off // scale + hs // scale,
            axis=axis,
        )
        for s, (_, off) in enumerate(plan)
    ]
    return jnp.concatenate(cores, axis=axis)


def tile_2d_logits(trunk: Callable, x, scale: int, halo: int, grid):
    """2-D composition of ``strip_tiled_logits``: ``grid = (ny, nx)`` tiles
    over rows x columns.  Each tile window carries the same ``halo`` on
    every side, so the reassembly equals ``trunk(x)`` by the receptive-field
    argument applied per axis."""
    ny, nx = grid
    fn = (
        (lambda s: strip_tiled_logits(trunk, s, scale, halo, nx, axis=2))
        if nx > 1
        else trunk
    )
    if ny > 1:
        return strip_tiled_logits(fn, x, scale, halo, ny, axis=1)
    return fn(x)


# Receptive-field radii of the FCN's two stages.  The two stride-2 3x3
# downscale convs reach 1 + 2 = 3 input pixels per side; each 3x3 context
# conv at dilation d reaches d FEATURE pixels per side (the 1x1 head adds
# none).  Tiling the stages SEPARATELY is what makes large-scan tiling
# cheap: one trunk-wide halo is ~140 input px (receptive_field_halo), i.e.
# 2.4x redundant pixels at 512px tiles, while per-stage halos cost only
# ~6% (stem) + ~2.3x-on-1/16-the-pixels (context).


def stem_halo(scale: int) -> int:
    """Input-px halo covering the downscale stem, rounded up to scale."""
    return scale * -(-3 // scale)


def context_halo(dilations) -> int:
    """Feature-px halo covering the dilated context stack + head."""
    return sum(dilations)


def auto_two_stage_grids(
    H: int,
    W: int,
    scale: int,
    dilations,
    stem_core: int = 512,
):
    """(stem_grid, ctx_grid) for ``two_stage_tiled_trunk``.

    Measured on v5e (2048px, B=16, bf16): column tiling and context
    tiling LOSE — the slice/concat data movement degrades the adjacent
    convs more than small maps help (stem 2-D tiles 27.6 ms vs row strips
    17.1 ms; context any-grid 37-47 ms vs 23.4 ms untiled s2d route).  So
    the auto plan is row-only stem strips at ~512-row cores, and NO
    context tiling — context_head_route handles large maps with the
    space-to-depth formulation instead (context_kernel.s2d_context_head).
    """
    sh = stem_halo(scale)
    stem_grid = (auto_n_strips(H, scale, sh, stem_core), 1)
    return stem_grid, (1, 1)


def two_stage_tiled_trunk(
    params, x4, cfg, stem_grid, ctx_grid, raw_gray: bool = False,
    return_packed: bool = False,
):
    """Large-scan FCN forward with PER-STAGE 2-D tiling — exact logits.

    Measured on v5e at 2048x2048 (B=16, bf16): the whole-image context
    module runs at ~3% MXU utilization (44 ms/batch) because XLA's conv
    emitter degrades on large spatial maps, while the SAME pixel count as
    128x128 maps takes 4.5 ms; row-only strips don't recover it (width
    stays large).  Tiling rows AND columns per stage — stem at ~512px
    cores with a 4px halo, context at ~128px feature cores with a
    sum(dilations) halo — keeps every conv in the fast small-spatial
    regime at ~6% / ~2.3x-redundancy cost respectively, instead of the
    2.4x a single trunk-wide 140px halo would cost.

    ``x4``: (B, H, W, 1) images (raw [0,255] gray when ``raw_gray``, else
    normalized).  Returns (B, H/scale, W/scale, O) logits equal to the
    untiled ``fused_model_apply`` (tests/test_strips.py).
    """
    from ubdvss_tpu.ops.pallas.context_kernel import (
        context_head_route,
        context_head_route_maybe_packed,
        stem_apply,
    )

    # precision/route decisions follow the WHOLE image, not the tile, so
    # tiled and untiled programs are numerically identical
    large = (x4.shape[1] // cfg.scale) * (x4.shape[2] // cfg.scale) > 128 * 128
    stem = lambda s: stem_apply(params, s, cfg, raw_gray=raw_gray, large=large)
    feat = tile_2d_logits(stem, x4, cfg.scale, stem_halo(cfg.scale), stem_grid)
    if return_packed and ctx_grid == (1, 1):
        # hand the s2d route's logits to packed-aware postprocessing
        # without the depth-to-space (see context_head_route_maybe_packed);
        # act_out: at the trunk's native dtype — callers astype(f32) the
        # API logits themselves (dead code when only detections are read)
        return context_head_route_maybe_packed(
            params, feat, cfg, large=large, act_out=True
        )
    ctx = lambda f: context_head_route(params, f, cfg, large=large)
    logits = tile_2d_logits(ctx, feat, 1, context_halo(cfg.dilations), ctx_grid)
    return (logits, None) if return_packed else logits


def packed_trunk_tile_grid(
    H: int, W: int, cfg, target_core: int = 1024
) -> tuple[int, tuple[int, int]]:
    """(halo, (ny, nx)) for trunk-level tiling of the s=2-packed trunks
    (bf16 ``packed_fused_trunk_tiled`` / int8
    ``quant.int8_packed_trunk_tiled``).

    Profiled (v5e, 4096² scans, B=4 int8): XLA SPACE-TO-BATCHES every
    conv of the whole-image packed trunk at this size — the input s2d
    alone materializes 42 ms of relayout (a 31.9 ms reshape + 10.1 ms
    copy feeding the stem's internally tiled layout) and each context
    conv pays a 100-400 MB layout copy; trunk device time 64 ms/batch.
    Tiling the WHOLE trunk at the image level into ~1024px cores (the
    2048²-scan regime, measured fast untiled) with one receptive-field
    halo halves it to 32 ms/batch, bit-exact.  Axes below 4096px stay
    untiled — at ≤2048px the untiled trunk is already in the good regime
    and the halo redundancy (~1.3×/axis) would be a pure loss."""
    from ubdvss_tpu.parallel.tiling import receptive_field_halo

    halo = receptive_field_halo(cfg)
    halo += (-halo) % 8  # tile windows must stay s2d/scale aligned
    ny = auto_n_strips(H, 8, halo, target_core) if H >= 4096 else 1
    nx = auto_n_strips(W, 8, halo, target_core) if W >= 4096 else 1
    return halo, (ny, nx)


def packed_fused_trunk_tiled(
    params, x4, cfg, raw_gray: bool = False,
    grid: tuple[int, int] | None = None,
):
    """bf16/f32 ``context_kernel.packed_fused_trunk`` with the same
    trunk-level >=4096px tiling as the int8 route (identity below);
    output logits equal the untiled trunk (tests/test_strips.py)."""
    from ubdvss_tpu.ops.pallas.context_kernel import packed_fused_trunk

    H, W = x4.shape[1], x4.shape[2]
    halo, auto = packed_trunk_tile_grid(H, W, cfg)
    if grid is None:
        grid = auto
    fn = lambda t: packed_fused_trunk(
        params, t, cfg, raw_gray=raw_gray, act_out=True
    )
    return tile_2d_logits(fn, x4, 8, halo, grid)


def auto_n_strips(H: int, scale: int, halo: int, target_core: int = 512) -> int:
    """Largest strip count with ~``target_core``-row cores that still
    divides H on the downscale grid and keeps windows inside the image;
    1 = don't tile (image too small to benefit)."""
    n = max(1, H // target_core)
    while n > 1 and (H % (n * scale) or H // n + 2 * halo >= H):
        n -= 1
    return n
