"""On-device connected-component labeling (CCL) — static shapes, jit/vmap-safe.

Replaces the reference's host-side ``cv2.connectedComponents`` call in heatmap
postprocessing (SURVEY.md §1 L8, §2b "OpenCV connectedComponents → on-device
iterative label-propagation kernel"; BASELINE.json north_star: "reworked as an
on-device iterative label-propagation kernel so boxes come off the chip").

Algorithm — iterative min-label propagation with *segmented-run scans*:
  1. every foreground pixel starts labeled with its own linear index;
  2. each round: (a) min over the (4/8-)neighborhood, (b) min over each
     contiguous horizontal run of foreground (one forward + one backward
     segmented min-scan along W), (c) the same along H.  A round therefore
     propagates labels across entire straight runs, so convergence takes
     O(#turns of the component geometry) rounds — 2-3 for barcode-like
     blobs, bounded by ~H+W even for boustrophedon snakes;
  3. a `lax.while_loop` runs rounds to fixpoint.  The fixpoint is exact: if
     a full round changes nothing, every pixel already holds the component
     minimum (induction along any in-component path).

TPU-first: the whole iteration is VPU-only — shifts, minima and
`lax.associative_scan` (log-depth) — with NO gather/scatter ops, which XLA
lowers catastrophically for this access pattern on TPU (measured ~1000x
slower than scans for the earlier pointer-jumping variant).

Compacted labels are numbered 1..N in raster-scan order of each component's
topmost-leftmost pixel (the same first-appearance order OpenCV's default
algorithm produces), 0 = background.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _neighbor_min(lab: jax.Array, sentinel: int, connectivity: int) -> jax.Array:
    """Min over the pixel's neighborhood (including itself), VPU shifts."""
    h, w = lab.shape[-2:]
    if connectivity == 8:
        # 8-neighborhood + center == 3x3 window min: separable into a
        # row-min then a column-min pass (4 slices/mins instead of 8);
        # the sentinel pad is the min identity so edges stay exact
        pw = jnp.pad(
            lab,
            [(0, 0)] * (lab.ndim - 2) + [(0, 0), (1, 1)],
            constant_values=sentinel,
        )
        m = jnp.minimum(
            lab, jnp.minimum(pw[..., :, 0:w], pw[..., :, 2 : w + 2])
        )
        ph = jnp.pad(
            m,
            [(0, 0)] * (lab.ndim - 2) + [(1, 1), (0, 0)],
            constant_values=sentinel,
        )
        return jnp.minimum(
            m, jnp.minimum(ph[..., 0:h, :], ph[..., 2 : h + 2, :])
        )
    p = jnp.pad(
        lab,
        [(0, 0)] * (lab.ndim - 2) + [(1, 1), (1, 1)],
        constant_values=sentinel,
    )
    m = lab
    m = jnp.minimum(m, p[..., 0:h, 1 : w + 1])  # up
    m = jnp.minimum(m, p[..., 2 : h + 2, 1 : w + 1])  # down
    m = jnp.minimum(m, p[..., 1 : h + 1, 0:w])  # left
    m = jnp.minimum(m, p[..., 1 : h + 1, 2 : w + 2])  # right
    return m


def _segmented_run_min(lab: jax.Array, mask: jax.Array, sentinel: int, axis: int):
    """Min of `lab` within each contiguous True-run of `mask` along `axis`.

    Two log-depth segmented min-scans (forward + backward); background
    elements are isolated single-element segments holding `sentinel`.
    """
    start = mask & ~jnp.roll(mask, 1, axis)
    idx0 = [slice(None)] * mask.ndim
    idx0[axis] = slice(0, 1)
    start = start.at[tuple(idx0)].set(mask[tuple(idx0)])
    seg_start = start | ~mask  # background isolates

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    fwd, _ = lax.associative_scan(comb, (lab, seg_start), axis=axis)

    # backward: segment boundaries are run *ends*
    end = mask & ~jnp.roll(mask, -1, axis)
    idxl = [slice(None)] * mask.ndim
    idxl[axis] = slice(-1, None)
    end = end.at[tuple(idxl)].set(mask[tuple(idxl)])
    seg_end = end | ~mask
    bwd, _ = lax.associative_scan(comb, (lab, seg_end), axis=axis, reverse=True)

    out = jnp.minimum(fwd, bwd)
    return jnp.where(mask, out, sentinel)


def _propagation_round(lab, mask, sentinel, connectivity):
    lab = jnp.where(mask, _neighbor_min(lab, sentinel, connectivity), sentinel)
    lab = _segmented_run_min(lab, mask, sentinel, axis=lab.ndim - 1)
    lab = _segmented_run_min(lab, mask, sentinel, axis=lab.ndim - 2)
    return lab


def label_propagation(
    mask: jax.Array,
    connectivity: int = 8,
    max_iters: int | None = None,
) -> jax.Array:
    """Raw min-index labels (sentinel=H*W at background); mask (..., H, W).

    Shared with the distributed tiled path (parallel/tiling.py), which runs
    the same rounds per tile between seam exchanges.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    sentinel = h * w
    if max_iters is None:
        max_iters = h + w
    mask = mask.astype(bool)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(mask, jnp.broadcast_to(idx, mask.shape), sentinel)

    def body(state):
        lab, _, it = state
        new = _propagation_round(lab, mask, sentinel, connectivity)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    lab, _, _ = lax.while_loop(cond, body, (lab0, jnp.array(True), jnp.array(0)))
    return lab


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def connected_components(
    mask: jax.Array, connectivity: int = 8, max_iters: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Label connected components of a boolean mask, on device.

    Args:
      mask: (H, W) bool foreground mask.
      connectivity: 4 or 8 (8 matches ``cv2.connectedComponents`` default).
      max_iters: safety cap on propagation rounds (default H+W; each round
        crosses whole straight runs, so this covers even snake masks).

    Returns:
      labels: (H, W) int32, 0 = background, components numbered 1..n in
        raster-scan order of their topmost-leftmost pixel.
      n: () int32 number of components.
    """
    if connectivity not in (4, 8):
        raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")
    h, w = mask.shape
    sentinel = h * w
    mask = mask.astype(bool)
    lab = label_propagation(mask, connectivity, max_iters)

    # Compact root labels to 1..n in raster order of the root pixel.
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    is_root = mask & (lab == idx)
    rank = jnp.cumsum(is_root.reshape(-1).astype(jnp.int32))  # 1-based at roots
    tgt = jnp.clip(lab, 0, sentinel - 1)
    labels = jnp.where(mask, rank[tgt].reshape(h, w), 0).astype(jnp.int32)
    n = rank[-1]
    return labels, n
