"""On-device min-area rectangle fitting — replaces host ``cv2.minAreaRect``.

Reference parity target (SURVEY.md §1 L8, §2b): for each connected component
the reference calls OpenCV's ``minAreaRect`` (rotating calipers over the
convex hull of the component's pixels, on host).  Here the whole computation
is static-shaped JAX, vmappable over components and batch, so rectangles come
off the chip directly (BASELINE.json north_star).

Pipeline per component:
  1. per-row x-extremes of the component mask (a W-axis reduction — the hull
     of a pixel set equals the hull of its per-row extreme points, shrinking
     the candidate set from O(H*W) to <= 2H with a *static* bound);
  2. Andrew's monotone-chain convex hull over the candidates, implemented as
     a `lax.fori_loop` with a fixed-size stack (vmap runs components in
     lockstep);
  3. exact minimum-area enclosing rectangle: the optimum has a side collinear
     with a hull edge, so evaluate every hull edge direction in one
     vectorized (edges x points) projection pass and take the min area.

Matches ``cv2.minAreaRect`` up to float rounding wherever the optimum is
unique (generic shapes).  Exactly mirror-symmetric components admit two
mirrored minimum rects; cv2's pick among such exact ties depends on its
internal float32 rounding order, which is not reproducible from a different
summation order.  We tie-break deterministically toward the smallest caliper
rotation angle; parity tests treat exact ties as an equivalence class
(equal minimal area + containment) — see tests/helpers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_INT_MAX = jnp.iinfo(jnp.int32).max


# ---------------------------------------------------------------------------
# Scan-based (gather-free, loop-free) production path.
#
# The serial monotone chain below (`monotone_chain_hull`) is exact but runs a
# sequential fori/while stack — measured ~30ms/image on TPU.  The production
# path instead computes each hull chain as a *convex envelope by parallel
# concave-point elimination*: a per-row extreme point is deleted when it lies
# strictly outside the chord of its nearest surviving neighbors; rounds of
# simultaneous deletion (neighbors found with log-depth segmented scans, no
# gathers) converge to exactly the envelope vertices + collinear points.
#   - hull vertices are never deleted: the chord of any two points on/inside
#     a convex envelope lies on/inside it;
#   - a stable set (no deletions) has every consecutive triple convex, hence
#     is globally convex == the envelope.
# Deletion tests use exact int32 arithmetic, so there are no fp tie issues.
# The caliper search then evaluates every surviving chain edge direction
# (a superset never below the true minimum, since min area over all
# directions is achieved at a hull edge) — one masked matmul + VPU min/max.
# ---------------------------------------------------------------------------


def _scan_neighbor(x, y, alive, axis, reverse):
    """For each slot: coords of nearest alive slot strictly before it in scan
    order (after it when reverse=True), via one log-depth scan + shift."""

    def comb(a, b):
        ax, ay, ah = a
        bx, by, bh = b
        return (
            jnp.where(bh, bx, ax),
            jnp.where(bh, by, ay),
            ah | bh,
        )

    ix, iy, ih = lax.associative_scan(
        comb,
        (jnp.where(alive, x, 0), jnp.where(alive, y, 0), alive),
        axis=axis,
        reverse=reverse,
    )
    # make exclusive: shift one step along scan direction
    shift = -1 if reverse else 1
    ex = jnp.roll(ix, shift, axis=axis)
    ey = jnp.roll(iy, shift, axis=axis)
    eh = jnp.roll(ih, shift, axis=axis)
    # zero the wrapped slot
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(-1, None) if reverse else slice(0, 1)
    eh = eh.at[tuple(idx)].set(False)
    return ex, ey, eh


def _convexify_chain(x, alive, sign, max_rounds=None):
    """Keep only convex-envelope points of the monotone chain (x[r], r).

    Args:
      x: (..., H) int32 chain x-coords per row.
      alive: (..., H) bool initial validity.
      sign: +1 deletes points strictly right of the neighbor chord (left/min
        chain), -1 deletes strictly left (right/max chain).
    Returns final alive mask.
    """
    H = x.shape[-1]
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32), x.shape)
    if max_rounds is None:
        max_rounds = H

    def body(state):
        alive, _, it = state
        px, py, ph = _scan_neighbor(x, y, alive, x.ndim - 1, reverse=False)
        nx, ny, nh = _scan_neighbor(x, y, alive, x.ndim - 1, reverse=True)
        # cross = (P - A) x (B - A) with A=prev, B=next, P=self (int32 exact)
        cross = (x - px) * (ny - py) - (y - py) * (nx - px)
        concave = alive & ph & nh & (sign * cross > 0)
        new_alive = alive & ~concave
        return new_alive, jnp.any(concave), it + 1

    alive, _, _ = lax.while_loop(
        lambda s: s[1] & (s[2] < max_rounds),
        body,
        (alive, jnp.array(True), jnp.array(0)),
    )
    return alive


def _compact_chain(x: jax.Array, alive: jax.Array, M: int):
    """Compact a chain's surviving entries to (..., M) slots, ascending row.

    Gather-light: one ``top_k`` over per-row keys + one small
    ``take_along_axis``.  Exact whenever the chain has <= M surviving
    points (guaranteed for convex-ish real components; fractal boundaries
    could exceed it — see ``min_area_rect_from_extremes_compact``).
    """
    H = x.shape[-1]
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32), x.shape)
    key = jnp.where(alive, H - 1 - y, -1)  # distinct; larger == earlier row
    vals, idx = lax.top_k(key, M)  # alive rows in ascending y, then invalid
    ok = vals >= 0
    cx = jnp.take_along_axis(x, idx, axis=-1)
    cy = jnp.where(ok, idx, 0)
    return jnp.where(ok, cx, 0), cy, ok


def min_area_rect_from_extremes(
    minx: jax.Array, maxx: jax.Array, rowvalid: jax.Array
) -> dict:
    """Exact min-area rect from per-row component extremes, fully vectorized.

    Args:
      minx/maxx: (..., H) int32 per-row extreme x (any value where invalid).
      rowvalid: (..., H) bool rows containing the component.
    Returns dict with leading dims (...): points (4,2), center, size,
    angle_deg, valid — same contract/conventions as ``min_area_rect``.
    """
    H = minx.shape[-1]
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32), minx.shape)
    minx = jnp.where(rowvalid, minx, 0).astype(jnp.int32)
    maxx = jnp.where(rowvalid, maxx, 0).astype(jnp.int32)

    alive_l = _convexify_chain(minx, rowvalid, +1)
    alive_r = _convexify_chain(maxx, rowvalid, -1)

    # chain edges: self -> next surviving point (exact hull edge directions)
    def chain_edges(x, alive):
        nx, ny, nh = _scan_neighbor(x, y, alive, minx.ndim - 1, reverse=True)
        ex = (nx - x).astype(jnp.float32)
        ey = (ny - y).astype(jnp.float32)
        ok = alive & nh
        return ex, ey, ok

    lex, ley, lok = chain_edges(minx, alive_l)
    rex, rey, rok = chain_edges(maxx, alive_r)

    # horizontal edges exist iff the top/bottom row has two distinct extremes
    pxf, _, phf = _scan_neighbor(minx, y, rowvalid, minx.ndim - 1, reverse=False)
    first_row = rowvalid & ~phf  # the topmost valid row flag per slot
    nxf, _, nhf = _scan_neighbor(minx, y, rowvalid, minx.ndim - 1, reverse=True)
    last_row = rowvalid & ~nhf
    horiz_ok = jnp.any((first_row | last_row) & (maxx > minx), axis=-1)

    ex = jnp.concatenate(
        [lex, rex, jnp.ones_like(minx[..., :1], jnp.float32)], axis=-1
    )
    ey = jnp.concatenate(
        [ley, rey, jnp.zeros_like(minx[..., :1], jnp.float32)], axis=-1
    )
    eok = jnp.concatenate([lok, rok, horiz_ok[..., None]], axis=-1)

    # candidate points: both chains' per-row extremes (masked)
    pxs = jnp.concatenate([minx, maxx], axis=-1).astype(jnp.float32)
    pys = jnp.concatenate([y, y], axis=-1).astype(jnp.float32)
    pok = jnp.concatenate([rowvalid, rowvalid], axis=-1)

    # degenerate single point: the first valid row's minx
    p0x = jnp.sum(jnp.where(first_row, minx, 0), axis=-1).astype(jnp.float32)
    p0y = jnp.sum(jnp.where(first_row, y, 0), axis=-1).astype(jnp.float32)
    valid = jnp.sum(rowvalid, axis=-1) > 0
    return _caliper_finish(ex, ey, eok, pxs, pys, pok, p0x, p0y, valid)


def _caliper_finish(ex, ey, eok, pxs, pys, pok, p0x, p0y, valid) -> dict:
    """Shared caliper tail: masked edge directions (..., D) + candidate
    points (..., P) -> min-area rect dict (cv2 conventions + tie-break)."""
    elen = jnp.sqrt(ex * ex + ey * ey)
    good = eok & (elen > 0)
    inv = 1.0 / jnp.maximum(elen, 1e-30)
    ux = ex * inv
    uy = ey * inv  # edge dir; v = (-uy, ux)

    # projections: (..., D, P)
    pu = ux[..., :, None] * pxs[..., None, :] + uy[..., :, None] * pys[..., None, :]
    pv = -uy[..., :, None] * pxs[..., None, :] + ux[..., :, None] * pys[..., None, :]
    inf = jnp.float32(3.4e38)
    pm = pok[..., None, :]
    min_u = jnp.min(jnp.where(pm, pu, inf), axis=-1)
    max_u = jnp.max(jnp.where(pm, pu, -inf), axis=-1)
    min_v = jnp.min(jnp.where(pm, pv, inf), axis=-1)
    max_v = jnp.max(jnp.where(pm, pv, -inf), axis=-1)
    w = max_u - min_u
    ht = max_v - min_v
    area = jnp.where(good, w * ht, inf)

    amin = jnp.min(area, axis=-1, keepdims=True)
    tie = good & (area <= amin * (1.0 + 1e-6) + 1e-9)
    phi = jnp.mod(-jnp.degrees(jnp.arctan2(ey, ex)), 90.0)
    best = jnp.argmin(jnp.where(tie, phi, inf), axis=-1)

    def take(a):
        return jnp.take_along_axis(a, best[..., None], axis=-1)[..., 0]

    ubx, uby = take(ux), take(uy)
    c_u = 0.5 * (take(min_u) + take(max_u))
    c_v = 0.5 * (take(min_v) + take(max_v))
    cx = c_u * ubx - c_v * uby
    cy = c_u * uby + c_v * ubx
    bw = take(w)
    bh = take(ht)
    angle = jnp.degrees(jnp.arctan2(uby, ubx)) % 180.0

    hw_x = 0.5 * bw * ubx
    hw_y = 0.5 * bw * uby
    hh_x = -0.5 * bh * uby
    hh_y = 0.5 * bh * ubx
    signs = jnp.asarray(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]], jnp.float32
    )
    corners_x = cx[..., None] + signs[:, 0] * hw_x[..., None] + signs[:, 1] * hh_x[..., None]
    corners_y = cy[..., None] + signs[:, 0] * hw_y[..., None] + signs[:, 1] * hh_y[..., None]
    corners = jnp.stack([corners_x, corners_y], axis=-1)  # (..., 4, 2)

    any_edge = jnp.any(good, axis=-1)
    cx = jnp.where(any_edge, cx, p0x)
    cy = jnp.where(any_edge, cy, p0y)
    bw = jnp.where(any_edge, bw, 0.0)
    bh = jnp.where(any_edge, bh, 0.0)
    angle = jnp.where(any_edge, angle, 0.0)
    pt = jnp.stack([p0x, p0y], axis=-1)
    corners = jnp.where(
        any_edge[..., None, None], corners, pt[..., None, :] * jnp.ones((4, 1))
    )
    return {
        "points": corners,
        "center": jnp.stack([cx, cy], axis=-1),
        "size": jnp.stack([bw, bh], axis=-1),
        "angle_deg": angle,
        "valid": valid,
    }


def min_area_rect_from_extremes_compact(
    minx: jax.Array,
    maxx: jax.Array,
    rowvalid: jax.Array,
    max_points: int = 64,
) -> dict:
    """Min-area rect from per-row extremes with hull compaction — the
    large-heatmap path (H > 128, e.g. 1024/2048px scans).

    The uncompacted formulation projects (2H+1 directions) x (2H points)
    per component: at H=256, K=32, B=32 that is a ~1 GB HBM tensor and
    dominated round-1 postprocessing.  After convexification the surviving
    chain entries are top_k-compacted to ``max_points`` slots
    (cfg.max_hull_points), shrinking the caliper pass to
    (2M+1) x (2M) — ~60x less traffic at M=64.

    Exactness: identical to ``min_area_rect_from_extremes`` whenever each
    convex chain has <= max_points surviving points.  Convex-ish real
    components (barcodes) have ~4-30 hull points; only fractal-boundary
    masks can exceed the bound, in which case the lowest rows of a chain
    are dropped (the rect may then under-cover — same bounded-hull contract
    as cfg.max_hull_points elsewhere).
    """
    H = minx.shape[-1]
    M = min(max_points, H)
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32), minx.shape)
    minx = jnp.where(rowvalid, minx, 0).astype(jnp.int32)
    maxx = jnp.where(rowvalid, maxx, 0).astype(jnp.int32)

    alive_l = _convexify_chain(minx, rowvalid, +1)
    alive_r = _convexify_chain(maxx, rowvalid, -1)
    lx, ly, lok_p = _compact_chain(minx, alive_l, M)
    rx, ry, rok_p = _compact_chain(maxx, alive_r, M)

    # chain edges: consecutive compacted entries (compaction preserves the
    # ascending-row order, so these ARE the surviving-neighbor edges)
    def edges(cx, cy, ok):
        nx = jnp.roll(cx, -1, axis=-1)
        ny = jnp.roll(cy, -1, axis=-1)
        nok = jnp.roll(ok, -1, axis=-1).at[..., -1].set(False)
        return (
            (nx - cx).astype(jnp.float32),
            (ny - cy).astype(jnp.float32),
            ok & nok,
        )

    lex, ley, lok = edges(lx, ly, lok_p)
    rex, rey, rok = edges(rx, ry, rok_p)

    # horizontal edge + degenerate point from the full-width arrays (cheap)
    pxf, _, phf = _scan_neighbor(minx, y, rowvalid, minx.ndim - 1, reverse=False)
    first_row = rowvalid & ~phf
    _, _, nhf = _scan_neighbor(minx, y, rowvalid, minx.ndim - 1, reverse=True)
    last_row = rowvalid & ~nhf
    horiz_ok = jnp.any((first_row | last_row) & (maxx > minx), axis=-1)

    ex = jnp.concatenate([lex, rex, jnp.ones_like(lx[..., :1], jnp.float32)], axis=-1)
    ey = jnp.concatenate([ley, rey, jnp.zeros_like(lx[..., :1], jnp.float32)], axis=-1)
    eok = jnp.concatenate([lok, rok, horiz_ok[..., None]], axis=-1)

    # candidate points: the compacted hull entries of both chains (their
    # union contains every support point of the full candidate set)
    pxs = jnp.concatenate([lx, rx], axis=-1).astype(jnp.float32)
    pys = jnp.concatenate([ly, ry], axis=-1).astype(jnp.float32)
    pok = jnp.concatenate([lok_p, rok_p], axis=-1)

    p0x = jnp.sum(jnp.where(first_row, minx, 0), axis=-1).astype(jnp.float32)
    p0y = jnp.sum(jnp.where(first_row, y, 0), axis=-1).astype(jnp.float32)
    valid = jnp.sum(rowvalid, axis=-1) > 0
    return _caliper_finish(ex, ey, eok, pxs, pys, pok, p0x, p0y, valid)


def monotone_chain_hull(pts: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Convex hull of masked integer points via Andrew's monotone chain.

    Args:
      pts: (N, 2) int32 points (x, y).
      valid: (N,) bool mask.
    Returns:
      hull: (N + 1, 2) int32 hull vertices (counter-clockwise in math coords)
        in slots [0, m); contents beyond m are arbitrary.
      m: () int32 number of hull vertices (0 if no valid points; 1 for a
        single distinct point; collinear sets give the 2 endpoints).
    """
    n_slots = pts.shape[0]
    big = jnp.int64 if (n_slots > 30000) else jnp.int32
    # Lex sort by (x, y); invalid points sort last.
    span = jnp.array(2 * 65536, dtype=big)
    key = pts[:, 0].astype(big) * span + pts[:, 1].astype(big)
    key = jnp.where(valid, key, jnp.iinfo(big).max)
    order = jnp.argsort(key)
    p = pts[order].astype(jnp.int32)
    n = valid.sum().astype(jnp.int32)

    # Drop duplicate consecutive points after sorting (duplicates break the
    # k<2 guard of the chain). Compact unique points to the front.
    prev = jnp.roll(p, 1, axis=0)
    is_uniq = (jnp.arange(n_slots) < n) & (
        (jnp.arange(n_slots) == 0) | jnp.any(p != prev, axis=1)
    )
    uniq_rank = jnp.cumsum(is_uniq.astype(jnp.int32)) - 1  # position if unique
    nu = is_uniq.sum().astype(jnp.int32)
    pu = (
        jnp.zeros((n_slots, 2), jnp.int32)
        .at[jnp.where(is_uniq, uniq_rank, n_slots)]
        .set(p, mode="drop")
    )

    hull_cap = n_slots + 1
    hull0 = jnp.zeros((hull_cap, 2), jnp.int32)

    def chain_step(i_point, limit, hull, k):
        """Push pu[i_point] onto the chain, popping non-left turns."""
        pt = pu[i_point]

        def pop_cond(kk):
            o = hull[kk - 2]
            a = hull[kk - 1]
            cr = (a[0] - o[0]) * (pt[1] - o[1]) - (a[1] - o[1]) * (pt[0] - o[0])
            return (kk >= limit) & (cr <= 0)

        k = lax.while_loop(pop_cond, lambda kk: kk - 1, k)
        hull = hull.at[k].set(pt)
        return hull, k + 1

    # Lower hull.
    def lower_body(i, st):
        hull, k = st
        return lax.cond(
            i < nu, lambda: chain_step(i, jnp.int32(2), hull, k), lambda: (hull, k)
        )

    hull, k = lax.fori_loop(0, n_slots, lower_body, (hull0, jnp.int32(0)))
    lower_sz = k

    # Upper hull: points nu-2 .. 0.
    def upper_body(j, st):
        hull, k = st
        i = nu - 2 - j
        return lax.cond(
            i >= 0, lambda: chain_step(i, lower_sz + 1, hull, k), lambda: (hull, k)
        )

    hull, k = lax.fori_loop(0, n_slots, upper_body, (hull, k))
    m = jnp.maximum(k - 1, 0)  # last point repeats the first
    m = jnp.where(nu == 1, 1, m)
    m = jnp.where(nu == 0, 0, m)
    return hull, m


def min_area_rect(hull: jax.Array, m: jax.Array) -> dict:
    """Exact minimum-area rectangle over hull vertices (static shapes).

    Args:
      hull: (M, 2) numeric hull vertices, valid in [0, m), CCW or CW.
      m: () int32 vertex count.
    Returns dict:
      points: (4, 2) f32 rectangle corners (consecutive order);
      center: (2,) f32; size: (2,) f32 (w, h) along (edge dir, normal);
      angle_deg: () f32 angle of the 'size[0]' side vs +x axis, in [0, 180);
      valid: () bool (False when m == 0).
    """
    M = hull.shape[0]
    h = hull.astype(jnp.float32)
    idx = jnp.arange(M)
    pvalid = idx < m
    nxt = jnp.where(m > 0, (idx + 1) % jnp.maximum(m, 1), 0)
    a = h
    b = h[nxt]
    e = b - a
    elen = jnp.sqrt(jnp.sum(e * e, axis=1))
    good = pvalid & (elen > 0)
    u = e / jnp.maximum(elen, 1e-30)[:, None]  # (M,2) edge dirs
    v = jnp.stack([-u[:, 1], u[:, 0]], axis=1)  # normals

    pu = u @ h.T  # (M edges, M points) projections
    pv = v @ h.T
    inf = jnp.float32(3.4e38)
    pmask = pvalid[None, :]
    min_u = jnp.min(jnp.where(pmask, pu, inf), axis=1)
    max_u = jnp.max(jnp.where(pmask, pu, -inf), axis=1)
    min_v = jnp.min(jnp.where(pmask, pv, inf), axis=1)
    max_v = jnp.max(jnp.where(pmask, pv, -inf), axis=1)
    w = max_u - min_u
    ht = max_v - min_v
    area = jnp.where(good, w * ht, inf)
    # Tie-break like cv2's rotatingCalipers: among minimal-area edge
    # directions, prefer the smallest caliper rotation angle, which in image
    # coordinates (y down) is (-theta) mod 90 degrees.  Symmetric components
    # (e.g. rasterized ellipses) genuinely tie; this keeps rect parity exact.
    amin = jnp.min(area)
    tie = good & (area <= amin * (1.0 + 1e-6) + 1e-9)
    phi = jnp.mod(-jnp.degrees(jnp.arctan2(e[:, 1], e[:, 0])), 90.0)
    best = jnp.argmin(jnp.where(tie, phi, inf))

    ub, vb = u[best], v[best]
    c_u = 0.5 * (min_u[best] + max_u[best])
    c_v = 0.5 * (min_v[best] + max_v[best])
    center = c_u * ub + c_v * vb
    size = jnp.stack([w[best], ht[best]])
    half_w = 0.5 * w[best]
    half_h = 0.5 * ht[best]
    corners = (
        center[None, :]
        + jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
        @ jnp.stack([half_w * ub, half_h * vb])
    )
    angle = jnp.degrees(jnp.arctan2(ub[1], ub[0])) % 180.0

    any_edge = jnp.any(good)
    # Degenerate: single point (or all-duplicate) component.
    p0 = h[0]
    center = jnp.where(any_edge, center, p0)
    size = jnp.where(any_edge, size, jnp.zeros(2))
    corners = jnp.where(any_edge, corners, jnp.broadcast_to(p0, (4, 2)))
    angle = jnp.where(any_edge, angle, 0.0)
    return {
        "points": corners,
        "center": center,
        "size": size,
        "angle_deg": angle,
        "valid": m > 0,
    }


@functools.partial(jax.jit, static_argnames=())
def min_area_rect_from_mask_stack(eq: jax.Array) -> dict:
    """Min-area rects for a stack of component masks.

    Args:
      eq: (H, W, K) bool — one mask per component (may be all-False).
    Returns dict of per-component arrays (leading dim K) as in
    ``min_area_rect``, computed from per-row extreme points.
    """
    H, W, K = eq.shape
    cols = jnp.arange(W, dtype=jnp.int32)
    # Per-row extremes per component: (K, H)
    minx = jnp.min(jnp.where(eq, cols[None, :, None], _INT_MAX), axis=1).T
    maxx = jnp.max(jnp.where(eq, cols[None, :, None], -1), axis=1).T
    row_any = jnp.any(eq, axis=1).T
    return min_area_rect_from_extremes(minx, maxx, row_any)
