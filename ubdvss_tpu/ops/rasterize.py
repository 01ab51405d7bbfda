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
interior test AND edge outline are one fused VPU pass over pixels x
polygons x edges (both scatter- and gather-free — TPU scatters
serialize); vmappable over batch.
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


def _outline_mask(px, py, x1, y1, vvalid, poly_ok, out_hw):
    """(P, H, W) dense DDA-equivalent edge rasterization — scatter-free.

    The original formulation scattered P*V*(H+W) sampled line points per
    image; TPU scatters serialize, and that scatter dominated the whole
    on-device target-synthesis pipeline (measured 51 ms/batch at a 32x32
    grid x B=32 — more than the augment warp and the train step combined).
    Dense equivalent: an x-major DDA edge (|dx| >= |dy|) covers exactly
    the pixels (X, round(py + (X-px)*dy/dx)) for columns X between its
    endpoints (the i-th DDA sample has major coordinate px+i*sign(dx) and
    minor round(py + i*dy/|dx|)); y-major symmetric.  Membership is then
    a pure broadcast-compare + OR-reduce over edges, fused by XLA into
    the same VPU pass as the interior test.  For the integer vertices the
    GT path produces (polygons_to_grid rounds) this is EXACTLY the DDA
    pixel set: both paths compute the minor coordinate with one or two
    exact small-integer float products and a division whose half-tie
    values (.5 exactly) are representable and identical; non-integer
    vertices may disagree with the old sampling on sub-pixel edges (not
    oracle-tested: cv2.fillPoly itself takes integer points only).
    """
    H, W = out_hw
    ok = vvalid & poly_ok[:, None]  # (P, V)
    dx, dy = x1 - px, y1 - py  # (P, V)
    xmajor = jnp.abs(dx) >= jnp.abs(dy)
    sdx = jnp.where(dx == 0, 1.0, dx)
    sdy = jnp.where(dy == 0, 1.0, dy)
    xs = jnp.arange(W, dtype=jnp.float32)
    lox, hix = jnp.minimum(px, x1), jnp.maximum(px, x1)
    loy, hiy = jnp.minimum(py, y1), jnp.maximum(py, y1)
    # x-major: y-value of the edge at every column (P, V, W)
    yx = jnp.round(py[..., None] + (xs - px[..., None]) * (dy / sdx)[..., None])
    in_col = (xs >= lox[..., None]) & (xs <= hix[..., None])
    okx = ok & xmajor
    oky = ok & ~xmajor

    def per_row(y):
        on_x = okx[..., None] & in_col & (yx == y)
        # y-major: column of the edge at this row (P, V)
        xy = jnp.round(px + (y - py) * (dx / sdy))
        on_y = (
            (oky & (y >= loy) & (y <= hiy))[..., None]
            & (xy[..., None] == xs)
        )
        return jnp.any(on_x | on_y, axis=1)  # (P, W)

    ys = jnp.arange(H, dtype=jnp.float32)
    return jnp.swapaxes(jax.vmap(per_row)(ys), 0, 1)  # (P, H, W)


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
    outline = _outline_mask(px, py, x1, y1, vvalid, poly_ok, out_hw)
    hit = inside | outline  # (P, H, W)

    pidx = jnp.arange(P, dtype=jnp.int32)
    last = jnp.max(jnp.where(hit, pidx[:, None, None], -1), axis=0)  # (H, W)
    # class lookup WITHOUT a per-pixel gather (class_ids[last] profiled at
    # 17 ms/batch on the v5e — TPU gathers serialize): select-sum over the
    # static P slots, exact because `last` matches at most one slot
    return jnp.sum(
        jnp.where(
            last[None] == pidx[:, None, None],
            class_ids.astype(jnp.int32)[:, None, None],
            0,
        ),
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("out_hw", "window"))
def rasterize_polygons_windowed(
    polys: jax.Array,
    n_verts: jax.Array,
    class_ids: jax.Array,
    out_hw: tuple[int, int],
    window: int,
) -> jax.Array:
    """``rasterize_polygons`` for SIZE-BOUNDED polygons, object-windowed.

    The dense path evaluates every polygon against every grid pixel —
    profiled at 11.4 ms/batch device time on the v5e for 128² grids
    (the single biggest op of the training data pipeline).  When every
    polygon's AABB fits a ``window``×``window`` box (the on-device
    synthesis path guarantees ≤ ~35 grid px at scale 4), evaluating each
    polygon only on a window anchored at its centroid cuts the pixel ×
    polygon work ~10×; the per-poly window hits are then placed into the
    full grid by one-hot row/col matmuls (no scatter — see
    synthgen's composite for the same trick) KEEPING the poly dim, so the
    final last-poly-wins/class-select reduction is identical to the dense
    path, overlapping polygons included.

    Contract: polygons whose AABB exceeds ``window - 4`` (2 px slack per
    side for anchor rounding + even-origin snapping) may be silently
    clipped to their window — callers must size ``window`` to their GT
    bound (the dense path stays the default for unbounded data).
    Exactness vs the dense path for in-bound polys:
    tests/test_rasterize.py.
    """
    H, W = out_hw
    wn = min(window, H, W)
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

    # window anchor per poly: AABB center (the vertex centroid can sit
    # arbitrarily off-center for irregular polys), clamped in-frame
    big = jnp.float32(1e9)
    cx = (
        jnp.min(jnp.where(vvalid, px, big), 1)
        + jnp.max(jnp.where(vvalid, px, -big), 1)
    ) / 2.0
    cy = (
        jnp.min(jnp.where(vvalid, py, big), 1)
        + jnp.max(jnp.where(vvalid, py, -big), 1)
    ) / 2.0
    cx = jnp.where(poly_ok, cx, 0.0)
    cy = jnp.where(poly_ok, cy, 0.0)
    # EVEN origins: the DDA/crossing math rounds half-ties to-even, and
    # an odd coordinate shift flips tie parity (round(36.5)=36 but
    # round(15.5)=16) — even shifts preserve every tie decision, keeping
    # the windowed result bit-equal to the dense path
    x0 = jnp.clip(jnp.round(cx).astype(jnp.int32) - wn // 2, 0, W - wn)
    y0 = jnp.clip(jnp.round(cy).astype(jnp.int32) - wn // 2, 0, H - wn)
    x0 = x0 // 2 * 2
    y0 = y0 // 2 * 2

    # evaluate on window coords by shifting each poly to its window frame
    sx = px - x0[:, None].astype(jnp.float32)
    sy = py - y0[:, None].astype(jnp.float32)
    sx1 = x1 - x0[:, None].astype(jnp.float32)
    sy1 = y1 - y0[:, None].astype(jnp.float32)
    hit_w = (
        _interior_mask(sx, sy, sx1, sy1, vvalid, poly_ok, (wn, wn))
        | _outline_mask(sx, sy, sx1, sy1, vvalid, poly_ok, (wn, wn))
    ).astype(jnp.float32)  # (P, wn, wn)

    # one-hot placement into the full grid, poly dim KEPT (overlap-exact)
    iw = jnp.arange(wn, dtype=jnp.int32)
    R = (
        (y0[:, None, None] + iw[None, :, None])
        == jnp.arange(H, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)  # (P, wn, H)
    C = (
        (x0[:, None, None] + iw[None, :, None])
        == jnp.arange(W, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)  # (P, wn, W)
    hit = jnp.einsum("pih,pij->phj", R, hit_w)
    hit = jnp.einsum("phj,pjx->phx", hit, C) > 0.5  # (P, H, W)

    pidx = jnp.arange(P, dtype=jnp.int32)
    last = jnp.max(jnp.where(hit, pidx[:, None, None], -1), axis=0)
    # gather-free class lookup (see rasterize_polygons): select-sum over
    # the static P slots
    return jnp.sum(
        jnp.where(
            last[None] == pidx[:, None, None],
            class_ids.astype(jnp.int32)[:, None, None],
            0,
        ),
        axis=0,
    )


def polygons_to_grid(
    polys: jax.Array, scale: int, round_to_int: bool = True
) -> jax.Array:
    """Input-resolution polygon coords -> heatmap-grid coords (1/scale),
    rounded to nearest int like the reference's fillPoly path (SURVEY.md §3.4)."""
    p = polys / jnp.float32(scale)
    return jnp.round(p) if round_to_int else p
