"""On-device connected-component labeling (CCL) — static shapes, jit/vmap-safe.

Replaces the reference's host-side ``cv2.connectedComponents`` call in heatmap
postprocessing (SURVEY.md §1 L8, §2b "OpenCV connectedComponents → on-device
iterative label-propagation kernel"; BASELINE.json north_star: "reworked as an
on-device iterative label-propagation kernel so boxes come off the chip").

Algorithm — iterative min-label propagation with pointer jumping:
  1. every foreground pixel starts labeled with its own linear index;
  2. each round every pixel takes the min label over its (4- or 8-)
     neighborhood, then performs two pointer-jumping steps
     ``label <- label[label]`` (a flat gather), compressing label chains so
     convergence is ~O(log diameter) rounds instead of O(diameter);
  3. a `lax.while_loop` runs rounds to fixpoint (all shapes static, so the
     whole thing lives inside one XLA program — no host round-trips);
  4. surviving root labels are compacted to 1..N in raster-scan order of each
     component's topmost-leftmost pixel (the same first-appearance order
     OpenCV's default algorithm produces), 0 = background.

Correctness argument for pointer jumping: after each propagation round a
pixel's label is the linear index of some pixel in the *same* component (the
min it has seen), so the gather ``label[label]`` stays inside the component
and can only decrease labels; the unique fixpoint assigns every pixel the
component's minimum linear index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _neighbor_min(lab: jax.Array, sentinel: int, connectivity: int) -> jax.Array:
    """Min over the pixel's neighborhood (including itself).

    Implemented with pad+slice shifts — XLA fuses these into one VPU pass.
    """
    h, w = lab.shape
    p = jnp.pad(lab, 1, constant_values=sentinel)
    m = lab
    # 4-neighborhood
    m = jnp.minimum(m, p[0:h, 1 : w + 1])      # up
    m = jnp.minimum(m, p[2 : h + 2, 1 : w + 1])  # down
    m = jnp.minimum(m, p[1 : h + 1, 0:w])      # left
    m = jnp.minimum(m, p[1 : h + 1, 2 : w + 2])  # right
    if connectivity == 8:
        m = jnp.minimum(m, p[0:h, 0:w])            # up-left
        m = jnp.minimum(m, p[0:h, 2 : w + 2])      # up-right
        m = jnp.minimum(m, p[2 : h + 2, 0:w])      # down-left
        m = jnp.minimum(m, p[2 : h + 2, 2 : w + 2])  # down-right
    return m


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def connected_components(
    mask: jax.Array, connectivity: int = 8, max_iters: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Label connected components of a boolean mask, on device.

    Args:
      mask: (H, W) bool foreground mask.
      connectivity: 4 or 8 (8 matches ``cv2.connectedComponents`` default).
      max_iters: safety cap on propagation rounds (default H+W, far beyond
        the ~log(H*W) rounds pointer jumping needs).

    Returns:
      labels: (H, W) int32, 0 = background, components numbered 1..n in
        raster-scan order of their topmost-leftmost pixel.
      n: () int32 number of components.
    """
    if connectivity not in (4, 8):
        raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")
    h, w = mask.shape
    sentinel = h * w  # > any linear index
    if max_iters is None:
        max_iters = h + w

    mask = mask.astype(bool)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(mask, idx, sentinel)

    def jump(lab):
        flat = lab.reshape(-1)
        tgt = jnp.clip(lab, 0, sentinel - 1)
        return jnp.where(mask, flat[tgt].reshape(h, w), sentinel)

    def body(state):
        lab, _, it = state
        new = jnp.where(mask, _neighbor_min(lab, sentinel, connectivity), sentinel)
        new = jump(jump(new))
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    lab, _, _ = lax.while_loop(cond, body, (lab0, jnp.array(True), jnp.array(0)))

    # Compact root labels to 1..n in raster order of the root pixel.
    is_root = mask & (lab == idx)
    rank = jnp.cumsum(is_root.reshape(-1).astype(jnp.int32))  # 1-based at roots
    tgt = jnp.clip(lab, 0, sentinel - 1)
    labels = jnp.where(mask, rank[tgt].reshape(h, w), 0).astype(jnp.int32)
    n = rank[-1]
    return labels, n
