"""Pallas TPU kernel: fused threshold + connected-component label propagation.

The north-star "on-device iterative label-propagation kernel"
(BASELINE.json): one grid program per image keeps the entire iteration
VMEM-resident — detection logits are read from HBM once, thresholded
in-kernel, and min-label propagation rounds (8/4-neighbor min + segmented
run-min via shift-doubling, see ops/ccl.py for the algorithm) run to
per-image fixpoint without touching HBM; only the final label map is
written back.  Compared to the XLA scan implementation (which re-streams
the whole batch from HBM ~40x per round), this is ~an order of magnitude
faster and convergence is per-image, not batch-lockstep.

Labels are "raw": each foreground pixel holds the minimum linear index of
its component; background holds H*W.  Downstream compaction is gather-free
(sort-based, ops/postproc.py) because XLA lowers large gathers
catastrophically on TPU.

Measured r5: capping the run-min doubling reach at ~32 px/round (still an
exact fixpoint — propagation just takes more rounds for longer runs) made
the geometry phase only 6% faster on sparse 512² scenes (7.86 -> 7.39
ms/batch at B=512, scripts/micro_geometry.py), ~1% end-to-end — and
risks MULTIPLYING round counts on large scans whose component runs exceed
the cap (2048²+ heatmaps).  Not adopted; re-evaluate only with per-size
measurements across every headline config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x, d: int, axis: int, fill):
    """Shift x by +d (toward higher indices) along axis, filling with `fill`.

    Implemented as a circular roll + edge mask — Mosaic lowers rolls to
    native lane/sublane rotates, unlike pad+concat which it rejects.
    """
    n = x.shape[axis]
    r = jnp.roll(x, d, axis)
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    keep = (idx >= d) if d > 0 else (idx < n + d)
    return jnp.where(keep, r, fill)


def _neighbor_min(lab, sentinel, connectivity):
    if connectivity == 8:
        # 8-neighborhood + center == 3x3 window min, which is separable:
        # a row-min pass then a column-min pass — 4 shifts/mins instead of
        # 8 (exact: colmin at r-1 = min of the three upper neighbors, etc;
        # the sentinel fill at edges is the min identity)
        m = jnp.minimum(
            lab,
            jnp.minimum(_shift(lab, 1, 1, sentinel), _shift(lab, -1, 1, sentinel)),
        )
        return jnp.minimum(
            m, jnp.minimum(_shift(m, 1, 0, sentinel), _shift(m, -1, 0, sentinel))
        )
    m = lab
    m = jnp.minimum(m, _shift(lab, 1, 0, sentinel))
    m = jnp.minimum(m, _shift(lab, -1, 0, sentinel))
    m = jnp.minimum(m, _shift(lab, 1, 1, sentinel))
    m = jnp.minimum(m, _shift(lab, -1, 1, sentinel))
    return m


def _prefix_sum(x, axis):
    """Log-doubling inclusive prefix sum (Mosaic-friendly shifts, no scan)."""
    n = x.shape[axis]
    d = 1
    while d < n:
        x = x + _shift(x, d, axis, 0)
        d *= 2
    return x


def _run_ids(mask, axis):
    """Run identifiers for ``_run_min``: unique id per contiguous mask-run
    along axis (-1 at background).  Depends only on the mask, so CCL
    fixpoint loops compute it ONCE and reuse it every round — the id
    prefix-sum is the most expensive part of a round otherwise."""
    mi = mask.astype(jnp.int32)
    start = mi * (1 - _shift(mi, 1, axis, 0))
    return jnp.where(mask, _prefix_sum(start, axis), -1)


def _run_min(lab, mask, sentinel, axis, limit=None, runid=None):
    """Min within contiguous mask-runs along axis, via run-id doubling.

    Mask handling is int32 throughout — Mosaic cannot roll/truncate i1
    vectors.  ``limit``: upper bound on any run's length (doubling stops
    once its reach covers it); the run-id prefix sum stays full-length —
    ids must be unique along the whole axis or distant runs could alias
    inside a shift window.  Used by the image-stacked CCL (runs never
    cross an image band).  ``runid``: precomputed ``_run_ids`` (hoisted
    out of fixpoint loops).
    """
    n = mask.shape[axis]
    if runid is None:
        runid = _run_ids(mask, axis)
    x = jnp.where(mask, lab, sentinel)
    d = 1
    while d < min(n, limit if limit is not None else n):
        for s in (d, -d):
            same = _shift(runid, s, axis, -2) == runid
            x = jnp.minimum(x, jnp.where(same, _shift(x, s, axis, sentinel), sentinel))
        d *= 2
    return jnp.where(mask, x, sentinel)


def _ccl_kernel(
    logits_ref, out_ref, *, thr_logit, connectivity, max_iters, run_limit=None
):
    """``run_limit``: per-image height bound for the vertical run-min when
    the block stacks several images (postproc_kernel._stack_group)."""
    lg = logits_ref[0]  # (H, W) f32
    H, W = lg.shape
    sentinel = H * W
    mask = lg > thr_logit
    rows = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lab0 = jnp.where(mask, rows * W + cols, sentinel)
    # run ids depend only on the (fixed) mask: compute once, reuse per round
    rid_w = _run_ids(mask, 1)
    rid_h = _run_ids(mask, 0)

    def round_(l):
        l = jnp.where(mask, _neighbor_min(l, sentinel, connectivity), sentinel)
        l = _run_min(l, mask, sentinel, 1, runid=rid_w)
        l = _run_min(l, mask, sentinel, 0, limit=run_limit, runid=rid_h)
        return l

    def body(state):
        l, _, it = state
        new = round_(l)
        changed = jnp.sum(jnp.where(new != l, 1, 0)) > 0
        return new, changed, it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    lab, _, _ = lax.while_loop(
        cond, body, (lab0, jnp.bool_(True), jnp.int32(0))
    )
    out_ref[0] = lab


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "connectivity", "max_iters", "interpret"),
)
def ccl_labels_from_logits(
    det_logits: jax.Array,
    threshold: float = 0.5,
    connectivity: int = 8,
    max_iters: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(B, H, W) detection logits -> (B, H, W) raw min-index labels.

    Background pixels hold H*W.  ``interpret=True`` runs the kernel in the
    Pallas interpreter (for CPU tests).
    """
    B, H, W = det_logits.shape
    if max_iters is None:
        max_iters = H + W
    import math

    thr_logit = math.log(threshold / (1.0 - threshold))
    kernel = functools.partial(
        _ccl_kernel,
        thr_logit=thr_logit,
        connectivity=connectivity,
        max_iters=max_iters,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(det_logits.astype(jnp.float32))
