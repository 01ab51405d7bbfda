"""On-device polygon rasterization — GT segmentation-map synthesis.

Replaces the reference's host-side ``cv2.fillPoly`` target synthesis
(SURVEY.md §1 L3 "Segmap manager", §3.4): ground-truth polygons (scaled by
1/cfg.scale to heatmap resolution, rounded to int) are filled into a
class-indexed int map, 0 = background, 1 + class_index for barcode pixels.

Fill rule, matching cv2.fillPoly semantics on integer-vertex polygons
(boundary-inclusive scanline fill): a pixel is written if its center is
inside the polygon under the even-odd crossing rule, OR it lies on the
rasterized (DDA) outline of any edge — cv2 fills the polygon boundary
inclusively.  DDA and cv2's fixed-point Bresenham can differ on exact
half-pixel ties of steep edges; tests bound the disagreement to <1% of
pixels on random polygons (exact on axis-aligned ones), which only perturbs
single GT boundary pixels (tests/test_rasterize.py; the empty reference
mount makes cv2 the parity oracle, SURVEY.md §0).

Static shapes throughout: polygons padded to (P, V, 2) + vertex counts;
interior test is one fused VPU pass over pixels x polygons x edges, the
outline is a scatter; vmappable over batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interior_mask(px, py, x1, y1, vvalid, poly_ok, out_hw):
    """(P, H, W) even-odd interior test over pixel centers."""
    H, W = out_hw
    xs = jnp.arange(W, dtype=jnp.float32)

    def per_row(y):
        cond = ((py <= y) & (y1 > y)) | ((y1 <= y) & (py > y))  # (P, V)
        t = jnp.where(cond, (y - py) / jnp.where(y1 == py, 1.0, y1 - py), 0.0)
        xcross = px + t * (x1 - px)  # (P, V)
        cross_valid = cond & vvalid
        inside_ct = jnp.sum(
            cross_valid[:, :, None] & (xcross[:, :, None] > xs[None, None, :]),
            axis=1,
        )
        return ((inside_ct % 2) == 1) & poly_ok[:, None]  # (P, W)

    ys = jnp.arange(H, dtype=jnp.float32)
    return jnp.swapaxes(jax.vmap(per_row)(ys), 0, 1)  # (P, H, W)


def _outline_mask(px, py, x1, y1, vvalid, poly_ok, out_hw, n_steps):
    """(P, H, W) DDA rasterization of every edge (cv2 line semantics appx)."""
    H, W = out_hw
    dx, dy = x1 - px, y1 - py  # (P, V)
    L = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)), 1.0)
    i = jnp.arange(n_steps, dtype=jnp.float32)  # (S,)
    t = jnp.minimum(i[None, None, :] / L[..., None], 1.0)  # (P, V, S)
    ex = jnp.round(px[..., None] + t * dx[..., None]).astype(jnp.int32)
    ey = jnp.round(py[..., None] + t * dy[..., None]).astype(jnp.int32)
    ok = (vvalid & poly_ok[:, None])[..., None] & jnp.broadcast_to(
        jnp.ones((), bool), t.shape
    )
    ok = ok & (ex >= 0) & (ex < W) & (ey >= 0) & (ey < H)
    ey_flat = jnp.where(ok, ey, H)  # out-of-range rows dropped

    def scatter_one(eyp, exp, okp):
        m = jnp.zeros((H + 1, W), bool)
        m = m.at[eyp.reshape(-1), exp.reshape(-1)].set(True, mode="drop")
        return m[:H]

    return jax.vmap(scatter_one)(ey_flat, jnp.clip(ex, 0, W - 1), ok)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def rasterize_polygons(
    polys: jax.Array,
    n_verts: jax.Array,
    class_ids: jax.Array,
    out_hw: tuple[int, int],
) -> jax.Array:
    """Fill polygons into a class-index map.

    Args:
      polys: (P, V, 2) vertices (x, y) in output-grid coords; slots beyond
        n_verts[p] ignored; polys with n_verts < 3 skipped.
      n_verts: (P,) int32 vertex counts.
      class_ids: (P,) int32 value written per polygon (1 + class_index);
        later polygons overwrite earlier ones (sequential fillPoly order).
      out_hw: (H, W) static output size.

    Returns: (H, W) int32 map, 0 background.
    """
    H, W = out_hw
    P, V, _ = polys.shape
    px = polys[..., 0].astype(jnp.float32)
    py = polys[..., 1].astype(jnp.float32)
    vidx = jnp.arange(V)
    vvalid = vidx[None, :] < n_verts[:, None]
    nxt = jnp.where(
        n_verts[:, None] > 0,
        (vidx[None, :] + 1) % jnp.maximum(n_verts[:, None], 1),
        0,
    )
    x1 = jnp.take_along_axis(px, nxt, axis=1)
    y1 = jnp.take_along_axis(py, nxt, axis=1)
    poly_ok = n_verts >= 3

    inside = _interior_mask(px, py, x1, y1, vvalid, poly_ok, out_hw)
    outline = _outline_mask(px, py, x1, y1, vvalid, poly_ok, out_hw, H + W)
    hit = inside | outline  # (P, H, W)

    pidx = jnp.arange(P, dtype=jnp.int32)
    last = jnp.max(jnp.where(hit, pidx[:, None, None], -1), axis=0)  # (H, W)
    return jnp.where(last >= 0, class_ids[jnp.maximum(last, 0)], 0).astype(jnp.int32)


def polygons_to_grid(
    polys: jax.Array, scale: int, round_to_int: bool = True
) -> jax.Array:
    """Input-resolution polygon coords -> heatmap-grid coords (1/scale),
    rounded to nearest int like the reference's fillPoly path (SURVEY.md §3.4)."""
    p = polys / jnp.float32(scale)
    return jnp.round(p) if round_to_int else p
