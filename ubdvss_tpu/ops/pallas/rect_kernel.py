"""Pallas TPU kernel: exact min-area rectangles from per-row extremes.

Finishes the on-device box pipeline (ops/rect.py documents the math): per
image, the (K, H) component extremes from the geometry kernel are
convexified into hull chains (parallel concave-point elimination with
doubling-scan neighbor lookups — exact int32 arithmetic), every hull-edge
direction is evaluated by projecting the candidate points (a (K, H, H)
VMEM-resident pass — the XLA formulation materializes ~GBs of projection
tensors in HBM for large batches), and the winning direction is selected
with the cv2 rotating-calipers tie-break.

The caliper rotation angle mod 90° is ordered via the folded-direction
tangent (monotone in the angle), so the kernel needs no arctan; the final
corner/angle reconstruction happens in XLA from the returned (K,)-sized
selection: [ux, uy, min_u, max_u, min_v, max_v, any_edge, p0x, p0y].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ubdvss_tpu.ops.pallas.ccl_kernel import _prefix_sum, _shift

_INF = 3.4e38  # python float: a jnp scalar here would be a captured constant


_PACK = 1 << 16  # x,y < 2^15 for any supported heatmap size


def _nearest_alive(x, y, alive_i, axis, reverse):
    """Nearest alive slot strictly before (after, if reverse) each position.

    x, y: int32 value arrays; alive_i: int32 0/1.  Returns (vx, vy, vh) with
    vh int32 0/1.  Log-depth doubling, shift-based.  (x, y) ride packed in
    one int32 — carrying three arrays through the doubling loop crashes the
    Mosaic compiler; two is fine.
    """
    n = x.shape[axis]
    packed = x * _PACK + y  # only read where alive
    vp, vh = packed, alive_i
    d = 1
    s = -1 if reverse else 1
    while d < n:
        sp = _shift(vp, s * d, axis, 0)
        sh = _shift(vh, s * d, axis, 0)
        take = (vh == 0) & (sh == 1)
        vp = jnp.where(take, sp, vp)
        vh = jnp.maximum(vh, sh)
        d *= 2
    # exclusive: shift one step along scan direction
    vp = _shift(vp, s, axis, 0)
    vh = _shift(vh, s, axis, 0)
    return vp // _PACK, vp % _PACK, vh


def _convexify_round(x, yi, alive, sign, axis):
    """One concave-elimination round: (new_alive, n_deleted)."""
    px, py, ph = _nearest_alive(x, yi, alive, axis, reverse=False)
    nx, ny, nh = _nearest_alive(x, yi, alive, axis, reverse=True)
    cross = (x - px) * (ny - py) - (yi - py) * (nx - px)
    concave = (alive == 1) & (ph == 1) & (nh == 1) & (sign * cross > 0)
    return jnp.where(concave, 0, alive), jnp.sum(jnp.where(concave, 1, 0))


def _convexify_pair(xl, xr, yi, alive_i, axis, max_rounds):
    """Convexify the left (+1) and right (-1) chains in ONE lockstep
    fixpoint loop: the rounds are data-dependent, so running both chains
    per iteration converges in max(rounds_l, rounds_r) rounds instead of
    the sum of two sequential while_loops — the convexify loop dominates
    the rect kernel's time on real blob workloads.

    UBDVSS_PALLAS_COMPAT=1 selects the round-proven sequential loops (see
    postproc_kernel for the escape-hatch contract)."""
    import os

    if os.environ.get("UBDVSS_PALLAS_COMPAT", "") == "1":
        def one(x, sign):
            def body(state):
                alive, _, it = state
                alive, ndel = _convexify_round(x, yi, alive, sign, axis)
                return alive, ndel > 0, it + 1

            alive, _, _ = lax.while_loop(
                lambda s: s[1] & (s[2] < max_rounds),
                body,
                (alive_i, jnp.bool_(True), jnp.int32(0)),
            )
            return alive

        return one(xl, +1), one(xr, -1)

    def body(state):
        al, ar, _, it = state
        al, dl = _convexify_round(xl, yi, al, +1, axis)
        ar, dr = _convexify_round(xr, yi, ar, -1, axis)
        return al, ar, (dl + dr) > 0, it + 1

    al, ar, _, _ = lax.while_loop(
        lambda s: s[2] & (s[3] < max_rounds),
        body,
        (alive_i, alive_i, jnp.bool_(True), jnp.int32(0)),
    )
    return al, ar


def _fold_phi_key(ux, uy):
    """Monotone surrogate of the caliper rotation angle (-theta) mod 90 deg.

    Fold the (possibly negated/rotated) direction into the first quadrant:
    among the four 90-degree rotations of (ux, -uy), exactly one has
    x > 0, y >= 0 (with x==0,y>0 wrapping to the next); return y/x = tan(phi).
    """
    cands = [
        (ux, -uy),
        (-uy, -ux),
        (-ux, uy),
        (uy, ux),
    ]
    kx = jnp.zeros_like(ux)
    ky = jnp.zeros_like(uy)
    found = jnp.zeros_like(ux, dtype=jnp.int32)
    for cx, cy in cands:
        ok = (cx > 0) & (cy >= 0) & (found == 0)
        kx = jnp.where(ok, cx, kx)
        ky = jnp.where(ok, cy, ky)
        found = jnp.where(ok, 1, found)
    return jnp.where(found == 1, ky / jnp.maximum(kx, 1e-30), 0.0)


def _rect_kernel(minx_ref, maxx_ref, sel_ref, *, K, H):
    mv = minx_ref[0]  # (K, H) int32
    xv = maxx_ref[0]
    rowv = (xv >= 0).astype(jnp.int32)
    rowv_b = xv >= 0
    yi = lax.broadcasted_iota(jnp.int32, (K, H), 1)
    big = jnp.int32(1 << 30)

    alive_l, alive_r = _convexify_pair(mv, xv, yi, rowv, 1, H)

    # candidate points (both chains), float
    pxl = mv.astype(jnp.float32)
    pxr = xv.astype(jnp.float32)
    py = yi.astype(jnp.float32)

    # point-axis chunk: keeps the (K, H, Pc) projection tensors ~<=2MB even
    # for 2048px scans (H=512); 128-aligned lane slices are Mosaic-legal
    PC = min(H, 128)

    def group_extents(ux, uy):
        """min/max of u- and v-projections over all valid candidate points.

        ux, uy: (K, H) directions.  Returns 4 arrays (K, H).
        """
        minu = jnp.full(ux.shape, _INF, jnp.float32)
        maxu = jnp.full(ux.shape, -_INF, jnp.float32)
        minv = jnp.full(ux.shape, _INF, jnp.float32)
        maxv = jnp.full(ux.shape, -_INF, jnp.float32)
        for p0 in range(0, H, PC):
            sl = slice(p0, p0 + PC)
            # slice 2-D first, then add the broadcast axis; the row-index
            # plane is a fresh per-chunk iota (+offset) — sliced iotas in
            # 3-D broadcasts hit Mosaic lowering bugs
            pm = rowv_b[:, sl][:, None, :]
            pyc = (
                lax.broadcasted_iota(jnp.int32, (K, 1, PC), 2).astype(jnp.float32)
                + p0
            )
            for px in (pxl, pxr):
                pxc = px[:, sl][:, None, :]
                proj_u = ux[:, :, None] * pxc + uy[:, :, None] * pyc
                minu = jnp.minimum(
                    minu, jnp.min(jnp.where(pm, proj_u, _INF), axis=2)
                )
                maxu = jnp.maximum(
                    maxu, jnp.max(jnp.where(pm, proj_u, -_INF), axis=2)
                )
                proj_v = -uy[:, :, None] * pxc + ux[:, :, None] * pyc
                minv = jnp.minimum(
                    minv, jnp.min(jnp.where(pm, proj_v, _INF), axis=2)
                )
                maxv = jnp.maximum(
                    maxv, jnp.max(jnp.where(pm, proj_v, -_INF), axis=2)
                )
        return minu, maxu, minv, maxv

    def chain_group(x, alive):
        nx, ny, nh = _nearest_alive(x, yi, alive, 1, reverse=True)
        ex = (nx - x).astype(jnp.float32)
        ey = (ny - yi).astype(jnp.float32)
        ok = (alive == 1) & (nh == 1)
        el2 = ex * ex + ey * ey
        ok = ok & (el2 > 0)
        inv = lax.rsqrt(jnp.maximum(el2, 1e-30))
        ux = ex * inv
        uy = ey * inv
        mnu, mxu, mnv, mxv = group_extents(ux, uy)
        w = mxu - mnu
        h = mxv - mnv
        area = jnp.where(ok, w * h, _INF)
        phi = jnp.where(ok, _fold_phi_key(ux, uy), _INF)
        return dict(
            ux=ux, uy=uy, ok=ok, area=area, phi=phi,
            mnu=mnu, mxu=mxu, mnv=mnv, mxv=mxv,
        )

    gl = chain_group(mv, alive_l)
    gr = chain_group(xv, alive_r)

    # horizontal direction (1, 0): valid iff top/bottom row has 2+ points
    minall = jnp.min(jnp.where(rowv_b, mv, big), axis=1)  # (K,)
    maxall = jnp.max(jnp.where(rowv_b, xv, -big), axis=1)
    ytop = jnp.min(jnp.where(rowv_b, yi, big), axis=1)
    ybot = jnp.max(jnp.where(rowv_b, yi, -big), axis=1)
    has_rows = jnp.sum(rowv, axis=1) > 0
    top_two = jnp.sum(jnp.where((yi == ytop[:, None]) & rowv_b, xv - mv, 0), axis=1) > 0
    bot_two = jnp.sum(jnp.where((yi == ybot[:, None]) & rowv_b, xv - mv, 0), axis=1) > 0
    h_ok = has_rows & (top_two | bot_two)
    h_w = (maxall - minall).astype(jnp.float32)
    h_h = (ybot - ytop).astype(jnp.float32)
    h_area = jnp.where(h_ok, h_w * h_h, _INF)
    h_phi = jnp.where(h_ok, 0.0, _INF)

    # --- global min area + phi tie-break across the three groups ---
    amin = jnp.minimum(
        jnp.minimum(jnp.min(gl["area"], axis=1), jnp.min(gr["area"], axis=1)),
        h_area,
    )  # (K,)
    thresh = amin * (1.0 + 1e-6) + 1e-9

    def tie_phi(g):
        t = g["ok"] & (g["area"] <= thresh[:, None])
        return jnp.min(jnp.where(t, g["phi"], _INF), axis=1), t

    phi_l, tie_l = tie_phi(gl)
    phi_r, tie_r = tie_phi(gr)
    phi_h = jnp.where(h_ok & (h_area <= thresh), h_phi, _INF)
    best_phi = jnp.minimum(jnp.minimum(phi_l, phi_r), phi_h)

    def extract(g, tie, quantities):
        sel = tie & (g["phi"] <= best_phi[:, None])
        # keep only the first matching direction per component
        csum = _prefix_sum(sel.astype(jnp.int32), 1)
        first = sel & (csum == 1)
        anyhit = jnp.sum(first.astype(jnp.int32), axis=1) > 0
        out = [
            jnp.sum(jnp.where(first, q, 0.0), axis=1) for q in quantities
        ]
        return anyhit, out

    ql = [gl[k] for k in ("ux", "uy", "mnu", "mxu", "mnv", "mxv")]
    hit_l, vals_l = extract(gl, tie_l, ql)
    qr = [gr[k] for k in ("ux", "uy", "mnu", "mxu", "mnv", "mxv")]
    hit_r, vals_r = extract(gr, tie_r, qr)
    # horizontal candidate values
    vals_h = [
        jnp.ones_like(h_w),  # ux
        jnp.zeros_like(h_w),  # uy
        minall.astype(jnp.float32),
        maxall.astype(jnp.float32),
        ytop.astype(jnp.float32),
        ybot.astype(jnp.float32),
    ]
    hit_h = h_ok & (h_phi <= best_phi)

    out_vals = []
    for vl, vr, vh in zip(vals_l, vals_r, vals_h):
        v = jnp.where(hit_l, vl, jnp.where(hit_r, vr, vh))
        out_vals.append(v)
    any_edge = hit_l | hit_r | hit_h

    # degenerate single point: topmost row's minx
    p0x = jnp.sum(
        jnp.where((yi == ytop[:, None]) & rowv_b, mv, 0), axis=1
    ).astype(jnp.float32)
    p0y = jnp.where(has_rows, ytop, 0).astype(jnp.float32)

    sel_ref[0, 0, 0] = out_vals[0]
    sel_ref[0, 0, 1] = out_vals[1]
    sel_ref[0, 0, 2] = out_vals[2]
    sel_ref[0, 0, 3] = out_vals[3]
    sel_ref[0, 0, 4] = out_vals[4]
    sel_ref[0, 0, 5] = out_vals[5]
    sel_ref[0, 0, 6] = any_edge.astype(jnp.float32)
    sel_ref[0, 0, 7] = p0x
    sel_ref[0, 0, 8] = p0y


def _rect_kernel_compact(minx_ref, maxx_ref, sel_ref, *, K, H, M):
    """Hull-compacted variant of ``_rect_kernel``.

    After convexification, each chain's surviving points are packed into M
    slots (rank = run prefix-sum; one fori pass — no gather), so the caliper
    projections shrink from (2 chains x H dirs) x (2 x H pts) to
    (2M dirs) x (2M pts): ~4x less VPU work at H=128.  Same bounded-hull
    contract as ops/rect.min_area_rect_from_extremes_compact — exact
    whenever each convex chain has <= M surviving points (M =
    cfg.max_hull_points; convex chains on an integer grid of height 128
    have at most ~40 vertices, realistic barcode blobs ~4-30).
    """
    mv = minx_ref[0]  # (K, H) int32
    xv = maxx_ref[0]
    rowv = (xv >= 0).astype(jnp.int32)
    rowv_b = xv >= 0
    yi = lax.broadcasted_iota(jnp.int32, (K, H), 1)
    big = jnp.int32(1 << 30)

    alive_l, alive_r = _convexify_pair(mv, xv, yi, rowv, 1, H)
    rank_l = _prefix_sum(alive_l, 1)  # alive slot -> 1..n (within chain)
    rank_r = _prefix_sum(alive_r, 1)

    # --- pack both chains into (K, 2M): [0, M) left, [M, 2M) right ---
    D = 2 * M
    dio = lax.broadcasted_iota(jnp.int32, (K, D), 1)

    def comp_body(j, carry):
        cx, cy, cok = carry
        sel_l = (alive_l == 1) & (rank_l == j + 1)
        xl = jnp.sum(jnp.where(sel_l, mv, 0), axis=1)  # (K,)
        yl = jnp.sum(jnp.where(sel_l, yi, 0), axis=1)
        vl = jnp.sum(sel_l.astype(jnp.int32), axis=1)
        sel_r = (alive_r == 1) & (rank_r == j + 1)
        xr = jnp.sum(jnp.where(sel_r, xv, 0), axis=1)
        yr = jnp.sum(jnp.where(sel_r, yi, 0), axis=1)
        vr = jnp.sum(sel_r.astype(jnp.int32), axis=1)
        cx = jnp.where(dio == j, xl[:, None], cx)
        cx = jnp.where(dio == M + j, xr[:, None], cx)
        cy = jnp.where(dio == j, yl[:, None], cy)
        cy = jnp.where(dio == M + j, yr[:, None], cy)
        cok = jnp.where(dio == j, vl[:, None], cok)
        cok = jnp.where(dio == M + j, vr[:, None], cok)
        return cx, cy, cok

    cx, cy, cok = lax.fori_loop(
        0,
        M,
        comp_body,
        (
            jnp.zeros((K, D), jnp.int32),
            jnp.zeros((K, D), jnp.int32),
            jnp.zeros((K, D), jnp.int32),
        ),
    )

    # --- hull edges: consecutive packed slots within each chain ---
    nx = _shift(cx, -1, 1, 0)
    ny = _shift(cy, -1, 1, 0)
    nok = _shift(cok, -1, 1, 0)
    chain_last = (dio == M - 1) | (dio == D - 1)
    ex = (nx - cx).astype(jnp.float32)
    ey = (ny - cy).astype(jnp.float32)
    eok = (cok == 1) & (nok == 1) & ~chain_last
    el2 = ex * ex + ey * ey
    eok = eok & (el2 > 0)
    inv = lax.rsqrt(jnp.maximum(el2, 1e-30))
    ux = ex * inv
    uy = ey * inv

    # --- projections: (K, D dirs, D pts) in <=128-lane chunks ---
    cxf = cx.astype(jnp.float32)
    cyf = cy.astype(jnp.float32)
    pv = cok == 1
    PC = min(D, 128)
    minu = jnp.full((K, D), _INF, jnp.float32)
    maxu = jnp.full((K, D), -_INF, jnp.float32)
    minv = jnp.full((K, D), _INF, jnp.float32)
    maxv = jnp.full((K, D), -_INF, jnp.float32)
    for p0 in range(0, D, PC):
        sl = slice(p0, p0 + PC)
        pm = pv[:, sl][:, None, :]
        pxc = cxf[:, sl][:, None, :]
        pyc = cyf[:, sl][:, None, :]
        proj_u = ux[:, :, None] * pxc + uy[:, :, None] * pyc
        minu = jnp.minimum(minu, jnp.min(jnp.where(pm, proj_u, _INF), axis=2))
        maxu = jnp.maximum(maxu, jnp.max(jnp.where(pm, proj_u, -_INF), axis=2))
        proj_v = -uy[:, :, None] * pxc + ux[:, :, None] * pyc
        minv = jnp.minimum(minv, jnp.min(jnp.where(pm, proj_v, _INF), axis=2))
        maxv = jnp.maximum(maxv, jnp.max(jnp.where(pm, proj_v, -_INF), axis=2))
    area = jnp.where(eok, (maxu - minu) * (maxv - minv), _INF)
    phi = jnp.where(eok, _fold_phi_key(ux, uy), _INF)

    # --- horizontal direction + degenerate point (full-res arrays) ---
    minall = jnp.min(jnp.where(rowv_b, mv, big), axis=1)  # (K,)
    maxall = jnp.max(jnp.where(rowv_b, xv, -big), axis=1)
    ytop = jnp.min(jnp.where(rowv_b, yi, big), axis=1)
    ybot = jnp.max(jnp.where(rowv_b, yi, -big), axis=1)
    has_rows = jnp.sum(rowv, axis=1) > 0
    top_two = jnp.sum(jnp.where((yi == ytop[:, None]) & rowv_b, xv - mv, 0), axis=1) > 0
    bot_two = jnp.sum(jnp.where((yi == ybot[:, None]) & rowv_b, xv - mv, 0), axis=1) > 0
    h_ok = has_rows & (top_two | bot_two)
    h_w = (maxall - minall).astype(jnp.float32)
    h_h = (ybot - ytop).astype(jnp.float32)
    h_area = jnp.where(h_ok, h_w * h_h, _INF)
    h_phi = jnp.where(h_ok, 0.0, _INF)

    # --- min area + phi tie-break (edge group + horizontal) ---
    amin = jnp.minimum(jnp.min(area, axis=1), h_area)  # (K,)
    thresh = amin * (1.0 + 1e-6) + 1e-9
    tie = eok & (area <= thresh[:, None])
    phi_e = jnp.min(jnp.where(tie, phi, _INF), axis=1)
    phi_h = jnp.where(h_ok & (h_area <= thresh), h_phi, _INF)
    best_phi = jnp.minimum(phi_e, phi_h)

    sel = tie & (phi <= best_phi[:, None])
    csum = _prefix_sum(sel.astype(jnp.int32), 1)
    first = sel & (csum == 1)
    hit_e = jnp.sum(first.astype(jnp.int32), axis=1) > 0
    vals_e = [
        jnp.sum(jnp.where(first, q, 0.0), axis=1)
        for q in (ux, uy, minu, maxu, minv, maxv)
    ]
    vals_h = [
        jnp.ones_like(h_w),
        jnp.zeros_like(h_w),
        minall.astype(jnp.float32),
        maxall.astype(jnp.float32),
        ytop.astype(jnp.float32),
        ybot.astype(jnp.float32),
    ]
    hit_h = h_ok & (h_phi <= best_phi)
    out_vals = [jnp.where(hit_e, ve, vh) for ve, vh in zip(vals_e, vals_h)]
    any_edge = hit_e | hit_h

    p0x = jnp.sum(
        jnp.where((yi == ytop[:, None]) & rowv_b, mv, 0), axis=1
    ).astype(jnp.float32)
    p0y = jnp.where(has_rows, ytop, 0).astype(jnp.float32)

    sel_ref[0, 0, 0] = out_vals[0]
    sel_ref[0, 0, 1] = out_vals[1]
    sel_ref[0, 0, 2] = out_vals[2]
    sel_ref[0, 0, 3] = out_vals[3]
    sel_ref[0, 0, 4] = out_vals[4]
    sel_ref[0, 0, 5] = out_vals[5]
    sel_ref[0, 0, 6] = any_edge.astype(jnp.float32)
    sel_ref[0, 0, 7] = p0x
    sel_ref[0, 0, 8] = p0y


@functools.partial(jax.jit, static_argnames=("interpret", "max_points"))
def min_area_rect_select(
    minx: jax.Array,
    maxx: jax.Array,
    interpret: bool = False,
    max_points: int | None = None,
) -> jax.Array:
    """(B, K, H) extremes -> (B, 9, K) selection rows (see module doc).

    ``max_points``: pack each convex chain to that many hull slots before
    the caliper pass (`_rect_kernel_compact`) — the production path
    (cfg.max_hull_points); None = the uncompacted exact kernel.

    Components are processed in K-chunks sized so the (KC, H, H) projection
    tensors stay within the ~16MB scoped-VMEM budget (large K or large H —
    e.g. 2048px tiled scans — otherwise OOM the kernel stack).
    """
    B0, K0, H = minx.shape
    # The kernel is row-parallel in the component axis, and (B, K, H) ->
    # (1, B*K, H) is layout-identical on (8,128) tiles — flattening packs
    # the whole batch into big per-program component chunks (kc=64 rows vs
    # K=16), quadrupling sublane utilization of every VPU op and cutting
    # grid-program count ~4x (measured ~3x end-to-end on the rect pass).
    minx = minx.reshape(1, B0 * K0, H)
    maxx = maxx.reshape(1, B0 * K0, H)
    B, K, H = minx.shape
    if max_points is not None and max_points >= H:
        max_points = None  # compaction cannot drop anything; use exact
    # 32MB of projection scratch (v5e has 128MB VMEM/core): bigger chunks =
    # more components per program = denser sublane packing of every VPU op
    budget = 32 * 1024 * 1024
    dim = 2 * max_points if max_points is not None else H
    pc = min(dim, 128)
    # live padded-f32 working-set per component: ~4 projection tensors on
    # the compacted path; the uncompacted exact kernel keeps ~14 (measured
    # from a Mosaic scoped-vmem OOM at kc=256, H=64: 108.95M total stack —
    # entry()'s 256px/K=64 config hit this when max_points >= H disabled
    # compaction), so it must chunk ~3.5x finer
    live = 4 if max_points is not None else 14
    per_comp = live * 4 * dim * max(pc, 128)
    cap = max(1, budget // per_comp)
    # Mosaic block rule: the K block dim must be 8-divisible or equal to K
    legal = [d for d in range(8, K + 1, 8) if K % d == 0 and d <= cap]
    if K <= cap:
        legal.append(K)
    kc = max(legal) if legal else K
    if max_points is not None:
        kernel = functools.partial(
            _rect_kernel_compact, K=kc, H=H, M=max_points
        )
    else:
        kernel = functools.partial(_rect_kernel, K=kc, H=H)
    # out block (1, 9, kc): second-to-last dim 9 is neither 8-divisible nor
    # full -> lay the output out as (B, K//kc, 9, kc) and merge after
    nchunk = K // kc
    sel = pl.pallas_call(
        kernel,
        grid=(B, nchunk),
        in_specs=[
            pl.BlockSpec((1, kc, H), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, H), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 9, kc), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nchunk, 9, kc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(minx.astype(jnp.int32), maxx.astype(jnp.int32))
    # (1, nchunk, 9, kc) -> (1, 9, B0*K0) -> (B0, 9, K0)
    flat = jnp.moveaxis(sel, 1, 2).reshape(B, 9, K)
    return jnp.moveaxis(flat[0].reshape(9, B0, K0), 0, 1)


def rects_from_selection(sel: jax.Array) -> dict:
    """(B, 9, K) kernel selection -> the min_area_rect_from_extremes dict."""
    ux, uy, mnu, mxu, mnv, mxv, anyf, p0x, p0y = [sel[:, i] for i in range(9)]
    any_edge = anyf > 0.5
    c_u = 0.5 * (mnu + mxu)
    c_v = 0.5 * (mnv + mxv)
    cx = c_u * ux - c_v * uy
    cy = c_u * uy + c_v * ux
    bw = mxu - mnu
    bh = mxv - mnv
    angle = jnp.degrees(jnp.arctan2(uy, ux)) % 180.0
    hw_x = 0.5 * bw * ux
    hw_y = 0.5 * bw * uy
    hh_x = -0.5 * bh * uy
    hh_y = 0.5 * bh * ux
    signs = jnp.asarray(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]], jnp.float32
    )
    corners_x = cx[..., None] + signs[:, 0] * hw_x[..., None] + signs[:, 1] * hh_x[..., None]
    corners_y = cy[..., None] + signs[:, 0] * hw_y[..., None] + signs[:, 1] * hh_y[..., None]
    corners = jnp.stack([corners_x, corners_y], axis=-1)  # (B, K, 4, 2)

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
    }
