"""Spatially-tiled inference with halo exchange + cross-tile CC merge.

The rebuild's sequence-parallelism analog (SURVEY.md §2c "SP/CP", §5
"Long-context"): high-resolution scans (BASELINE config 4: 2048x2048) are
sharded row-wise across a ``Mesh('spatial')``.  Per device, inside one
``shard_map``-ped XLA program:

  1. halo exchange — each tile receives ``halo`` rows from its neighbors
     via ``lax.ppermute`` (the ring-style neighbor comm pattern; zeros
     arrive at the true image borders, cropped away below);
  2. local fused preproc + FCN forward on the padded tile; the halo is
     sized to the network's receptive field, so after cropping the local
     heatmap equals the whole-image heatmap exactly (strided convs stay
     phase-aligned because tile starts and halo are multiples of scale);
  3. distributed CCL: local min-label propagation over *global* linear
     pixel indices, alternated with seam exchanges of boundary label rows
     (``ppermute``), inside a ``lax.while_loop`` whose convergence flag is
     all-reduced with ``psum`` — components spanning tiles merge exactly;
  4. labels + logits are ``all_gather``-ed (replicated) and the shared
     single-device tail (ops.postproc.finish_postprocess) produces the
     rectangles — identical to whole-image postprocessing.

Seam-exactness vs whole-image inference is asserted in
tests/test_parallel.py on the 8-virtual-CPU-device mesh (SURVEY.md §4.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ubdvss_tpu.models.model import get_model
from ubdvss_tpu.net_config import NetConfig
from ubdvss_tpu.ops.ccl import _propagation_round
from ubdvss_tpu.ops.postproc import finish_postprocess
from ubdvss_tpu.ops.preproc import normalize, rgb_to_grayscale


def receptive_field_halo(cfg: NetConfig) -> int:
    """Input-pixel halo covering the FCN receptive field, multiple of scale.

    Each 3x3 context conv at dilation d reaches d feature pixels per side;
    the two stride-2 downscale convs reach ~3 input pixels; round up.
    """
    feat_radius = sum(cfg.dilations) + 1  # +1 head/safety
    return cfg.scale * (feat_radius + 1)


def _seam_merge_ccl(lab, mask, axis, n, sentinel, connectivity, base, To, Wo):
    """Distributed CCL core: local fixpoint + seam exchange until global
    convergence (labels are global linear indices). Runs inside shard_map.

    Returns ``(lab, converged)``; converged is a replicated bool — True iff
    the loop exited because a full seam round changed nothing everywhere
    (psum'd flag), rather than hitting the iteration cap.  The cap covers
    the worst case (a component snaking through every seam needs O(n)
    rounds per traversal, O(To·n) total), so an unconverged exit should
    never happen; surfacing the flag makes the module's "bit-identical"
    contract checkable instead of silent (VERDICT r1 #9).
    """
    idx = lax.axis_index(axis)
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    max_rounds = To * n + 4 * n + 8

    def seam_round(state):
        lab, _, it = state
        lab = _local_ccl_to_fixpoint(lab, mask, sentinel, connectivity, To + Wo)
        top_nb = lax.ppermute(lab[-1], axis, fwd)  # neighbor above's last row
        bot_nb = lax.ppermute(lab[0], axis, bwd)  # neighbor below's first row
        top_valid = idx > 0
        bot_valid = idx < n - 1

        def seam_min(nb_row, my_row_mask):
            cands = [nb_row]
            if connectivity == 8:
                big = jnp.full((1,), sentinel, nb_row.dtype)
                cands.append(jnp.concatenate([nb_row[1:], big]))
                cands.append(jnp.concatenate([big, nb_row[:-1]]))
            m = cands[0]
            for c in cands[1:]:
                m = jnp.minimum(m, c)
            return jnp.where(my_row_mask, m, sentinel)

        new_top = jnp.minimum(
            lab[0], jnp.where(top_valid, seam_min(top_nb, mask[0]), sentinel)
        )
        new_bot = jnp.minimum(
            lab[-1], jnp.where(bot_valid, seam_min(bot_nb, mask[-1]), sentinel)
        )
        changed = jnp.any(new_top != lab[0]) | jnp.any(new_bot != lab[-1])
        if To == 1:
            # single heatmap row per tile: row 0 IS row To-1 — merge both
            # seam updates instead of letting the bottom write clobber the top
            lab = lab.at[0].set(jnp.minimum(new_top, new_bot))
        else:
            lab = lab.at[0].set(new_top).at[To - 1].set(new_bot)
        changed_global = lax.psum(changed.astype(jnp.int32), axis) > 0
        return lab, changed_global, it + 1

    lab, still_changing, _ = lax.while_loop(
        lambda s: s[1] & (s[2] < max_rounds),
        seam_round,
        (lab, jnp.array(True), jnp.array(0)),
    )
    return lab, ~still_changing


def _compact_global_labels(lab_full, sentinel, Ho, Wo):
    """Global min-index labels -> 1..K raster-order compaction (ops.ccl rule)."""
    mask = lab_full < sentinel
    idx_full = jnp.arange(Ho * Wo, dtype=jnp.int32).reshape(Ho, Wo)
    is_root = mask & (lab_full == idx_full)
    rank = jnp.cumsum(is_root.reshape(-1).astype(jnp.int32))
    return jnp.where(
        mask, rank[jnp.clip(lab_full, 0, sentinel - 1)].reshape(Ho, Wo), 0
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "connectivity"))
def distributed_connected_components(
    mask: jax.Array, mesh, axis: str = "spatial", connectivity: int = 8
) -> jax.Array:
    """Row-sharded CCL across the mesh; returns gathered compacted labels.

    Semantically identical to ops.ccl.connected_components on the full mask
    (asserted in tests/test_parallel.py, including components that snake
    across tile seams)."""
    n = mesh.shape[axis]
    Ho, Wo = mask.shape
    assert Ho % n == 0
    To = Ho // n
    sentinel = Ho * Wo

    def per_tile(m):
        idx = lax.axis_index(axis)
        base = (idx * To * Wo).astype(jnp.int32)
        lin = base + jnp.arange(To * Wo, dtype=jnp.int32).reshape(To, Wo)
        lab = jnp.where(m, lin, sentinel)
        lab, converged = _seam_merge_ccl(
            lab, m, axis, n, sentinel, connectivity, base, To, Wo
        )
        return lax.all_gather(lab, axis, axis=0, tiled=True), converged

    lab_full, converged = shard_map(
        per_tile,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(), P()),
        check_vma=False,
    )(mask)
    return _compact_global_labels(lab_full, sentinel, Ho, Wo), converged


def _local_ccl_to_fixpoint(lab, mask, sentinel, connectivity, max_iters):
    """Min-label propagation within a tile (labels carry global indices);
    the same gather-free scan rounds as ops.ccl (see its docstring)."""

    def body(state):
        l, _, it = state
        new = _propagation_round(l, mask, sentinel, connectivity)
        return new, jnp.any(new != l), it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    lab, _, _ = lax.while_loop(cond, body, (lab, jnp.array(True), jnp.array(0)))
    return lab


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "axis", "connectivity", "halo")
)
def tiled_detect(
    params,
    image: jax.Array,
    cfg: NetConfig,
    mesh,
    axis: str = "spatial",
    connectivity: int = 8,
    halo: int | None = None,
) -> dict:
    """Whole-scan detection, row-sharded across the mesh.

    Args:
      image: (H, W) raw [0,255] grayscale (or (H, W, 3) color), H divisible
        by n_devices * cfg.scale.  No resize is applied (large-scan path).
    Returns: the postprocess() dict (identical to whole-image inference).
    """
    n = mesh.shape[axis]
    H = image.shape[0]
    W = image.shape[1]
    assert H % (n * cfg.scale) == 0, (H, n, cfg.scale)
    T = H // n  # rows per tile
    rf_halo = receptive_field_halo(cfg)
    if halo is None:
        halo = rf_halo
    # Thin tiles (T < halo) fetch their halo from MULTIPLE neighbors via
    # chained ppermutes (ADVICE r1: no silent clamp — seam logits stay
    # exact for any device count).  The only true bound is the image edge,
    # which the boundary mask re-zeroes anyway.
    halo = min(halo, (n - 1) * T)
    halo -= halo % cfg.scale
    n_hops = -(-halo // T) if halo else 0  # ceil
    assert halo % cfg.scale == 0 and halo <= (n - 1) * T, (halo, T, n)
    Ho, Wo = H // cfg.scale, W // cfg.scale
    To = T // cfg.scale
    ho = halo // cfg.scale
    model = get_model(cfg)
    sentinel = Ho * Wo

    fwd = [(i, i + 1) for i in range(n - 1)]  # send downward (to next rank)
    bwd = [(i + 1, i) for i in range(n - 1)]  # send upward

    def per_tile(params, img_tile):
        # img_tile: (T, W[, C]) raw [0,255]
        x = img_tile.astype(jnp.float32)
        if x.ndim == 3:
            x = rgb_to_grayscale(x, "rgb")
        idx = lax.axis_index(axis)

        # --- 1. halo exchange of raw rows: hop h forwards whole tiles h
        # ranks along the axis, so rank i accumulates tiles i-n_hops..i-1
        # above and i+1..i+n_hops below; edge ranks receive zeros from the
        # truncated permutation (re-zeroed by the boundary mask anyway) ---
        above_tiles, below_tiles = [], []
        cur_up, cur_dn = x, x
        for _ in range(n_hops):
            cur_up = lax.ppermute(cur_up, axis, fwd)  # tile from rank i-h
            cur_dn = lax.ppermute(cur_dn, axis, bwd)  # tile from rank i+h
            above_tiles.insert(0, cur_up)
            below_tiles.append(cur_dn)
        if n_hops:
            from_above = jnp.concatenate(above_tiles, axis=0)[
                n_hops * T - halo :
            ]
            from_below = jnp.concatenate(below_tiles, axis=0)[:halo]
            padded = jnp.concatenate([from_above, x, from_below], axis=0)
        else:
            padded = x

        # --- 2. local fused preproc + FCN ---
        # boundary mask: rows of the padded tile that fall outside the
        # global image must be re-zeroed after every conv layer so tile
        # borders reproduce whole-image SAME-padding exactly (model.py).
        g_rows = idx * T + jnp.arange(T + 2 * halo) - halo
        row_ok = ((g_rows >= 0) & (g_rows < H)).astype(jnp.float32)
        bmask = jnp.broadcast_to(row_ok[None, :, None, None], (1, T + 2 * halo, W, 1))
        inp = normalize(padded)[None, ..., None]
        logits = model.apply({"params": params}, inp, boundary_mask=bmask)[0]
        logits = logits[ho : ho + To]  # crop halo -> (To, Wo, C) exact

        # --- 3. distributed CCL over global linear indices ---
        det = jax.nn.sigmoid(logits[..., 0])
        mask = det > cfg.detection_threshold
        base = (idx * To * Wo).astype(jnp.int32)
        lin = base + jnp.arange(To * Wo, dtype=jnp.int32).reshape(To, Wo)
        lab = jnp.where(mask, lin, sentinel)
        lab, converged = _seam_merge_ccl(
            lab, mask, axis, n, sentinel, connectivity, base, To, Wo
        )

        # --- 4. gather (replicated) ---
        lab_full = lax.all_gather(lab, axis, axis=0, tiled=True)  # (Ho, Wo)
        logits_full = lax.all_gather(logits, axis, axis=0, tiled=True)
        return lab_full, logits_full, converged

    in_spec = P(axis) if image.ndim == 2 else P(axis, None, None)
    lab_full, logits_full, ccl_converged = shard_map(
        per_tile,
        mesh=mesh,
        in_specs=(P(), in_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(params, image)

    # gather-free tail: top-k raster-ordered roots -> per-component masks
    # (identical to compaction + finish_postprocess; big gathers lower
    # catastrophically on TPU)
    from ubdvss_tpu.ops.postproc import (
        eq_from_raw_labels,
        finish_from_eq,
        roots_from_raw_labels,
    )

    rootvals, root_valid = roots_from_raw_labels(lab_full, cfg.max_components)
    eq = eq_from_raw_labels(lab_full, rootvals, root_valid)
    idx_full = jnp.arange(Ho * Wo, dtype=jnp.int32).reshape(Ho, Wo)
    total = jnp.sum((lab_full == idx_full) & (lab_full < sentinel)).astype(jnp.int32)
    out = finish_from_eq(logits_full, eq, cfg, num_components_total=total)
    out["logits"] = logits_full
    out["ccl_converged"] = ccl_converged
    return out
