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
):
    """Run ``trunk`` ((B', h, W[, C]) images -> (B', h/scale, W/scale, O)
    logits, SAME padding) over row strips of ``x`` and reassemble logits
    identical to ``trunk(x)``.

    ``x``: (B, H, W) or (B, H, W, C); H divisible by n_strips*scale.
    """
    B, H = x.shape[0], x.shape[1]
    plan = strip_plan(H, scale, halo, n_strips)
    hs = H // n_strips
    win = hs + 2 * halo
    strips = jnp.concatenate(
        [lax.slice_in_dim(x, st, st + win, axis=1) for st, _ in plan], axis=0
    )
    y = trunk(strips)  # (S*B, win/scale, W/scale, O)
    cores = [
        lax.slice_in_dim(
            lax.slice_in_dim(y, s * B, (s + 1) * B, axis=0),
            off // scale,
            off // scale + hs // scale,
            axis=1,
        )
        for s, (_, off) in enumerate(plan)
    ]
    return jnp.concatenate(cores, axis=1)


def auto_n_strips(H: int, scale: int, halo: int, target_core: int = 512) -> int:
    """Largest strip count with ~``target_core``-row cores that still
    divides H on the downscale grid and keeps windows inside the image;
    1 = don't tile (image too small to benefit)."""
    n = max(1, H // target_core)
    while n > 1 and (H % (n * scale) or H // n + 2 * halo >= H):
        n -= 1
    return n
