"""Pallas TPU kernel: threshold → CCL → component slots + rect extremes.

The heatmap-postprocessing front half as ONE VMEM-resident kernel per image
(BASELINE.json north_star "on-device iterative label-propagation kernel so
boxes come off the chip"):

  1. threshold detection logits in-kernel;
  2. min-label propagation to fixpoint (see ccl_kernel.py);
  3. extract the K smallest component roots (raster order) by iterated
     masked minimum — no sort, no gather;
  4. emit a compact per-pixel component-slot map (0..K-1, K = background)
     and per-component per-row x-extremes (the min-area-rect candidate
     set, ops/rect.py).

Per-component sums (areas, detection-prob sums, class-prob sums) are then
ONE batched one-hot matmul over the slot map back in XLA — `one_hot(slot,K)`
contracts against `[1, sigmoid(det), softmax(cls)]` on the MXU in a single
HBM pass, instead of K re-reads of the class tensor.  The (B, H, W, K)
boolean masks the pure-XLA path materializes never exist; the rectangle fit
itself stays in XLA (ops/rect.py) on the compact extremes.

Mosaic constraints shaping this design (all hit empirically): no lane-offset
channel slicing, no (H*W, K) reshapes, no bool-vector rolls, ~16MB scoped
VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ubdvss_tpu.ops.pallas.ccl_kernel import _ccl_kernel

# UBDVSS_PALLAS_COMPAT=1: run the round-proven single-kernel formulations
# (per-image geometry mega-kernel, sequential convexify) instead of the
# grouped/lockstep ones.  bench.py re-execs itself with this set if the
# default path ever fails to compile on the target toolchain, so the
# benchmark degrades to the proven kernels instead of dying.
import os as _os

_COMPAT = _os.environ.get("UBDVSS_PALLAS_COMPAT", "") == "1"


def _geometry_kernel_compat(
    det_ref,
    rootvals_ref,
    slot_ref,
    minx_ref,
    maxx_ref,
    nroots_ref,
    roots_smem,
    *,
    thr_logit,
    connectivity,
    max_iters,
    K,
):
    """UBDVSS_PALLAS_COMPAT fallback: the whole geometry (CCL fixpoint +
    roots/slots/extremes) as one per-image kernel — round-2's proven form."""
    from ubdvss_tpu.ops.pallas.ccl_kernel import _neighbor_min, _run_min

    det_logit = det_ref[0]  # (H, W)
    H, W = det_logit.shape
    sentinel = H * W
    mask = det_logit > thr_logit
    rows = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lab0 = jnp.where(mask, rows * W + cols, sentinel)

    def round_(l):
        l = jnp.where(mask, _neighbor_min(l, sentinel, connectivity), sentinel)
        l = _run_min(l, mask, sentinel, 1)
        l = _run_min(l, mask, sentinel, 0)
        return l

    def body(state):
        l, _, it = state
        new = round_(l)
        changed = jnp.sum(jnp.where(new != l, 1, 0)) > 0
        return new, changed, it + 1

    lab, _, _ = lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters),
        body,
        (lab0, jnp.bool_(True), jnp.int32(0)),
    )
    _roots_slots_extremes(
        lab, mask, rows, cols, sentinel, K, H, W,
        rootvals_ref, slot_ref, minx_ref, maxx_ref, nroots_ref, roots_smem,
    )


def _stack_group(det_logits: jax.Array, budget: int = 1_100_000):
    """Pick the image-stacking parameters for the grouped CCL kernel.

    Returns (G, gap): G images are stacked vertically per grid program with
    ``gap`` dead rows (-inf logits => background) between them, so one
    program's label-propagation rounds cover G images at once — the
    per-image maps are tiny ((128, 128) at the 512px config ≈ 16 VPU cycles
    per op), so the sequential per-image grid is overhead-bound and G-fold
    stacking amortizes it.  The gap keeps components of
    adjacent images disconnected (8-connectivity reaches 1 row; gap also
    rounds H to a sublane multiple) so labels are bit-identical to
    per-image CCL.  ``budget`` caps stacked elements (~8 live i32/f32
    stacked arrays inside the fixpoint loop must sit in VMEM).

    Trade-off: convergence becomes group-lockstep — the group iterates
    until its SLOWEST image's fixpoint (was per-image).  Real detection
    masks converge in a handful of rounds uniformly, so the G-fold
    dispatch amortization dominates; a pathological snake in one image
    would drag its G-1 groupmates along (bounded by max_iters as before).
    """
    B, H, W = det_logits.shape
    gap = 8 - (H % 8) if H % 8 else 8
    # G up to 64: measured r5 (512², B=512, K=16) — G=32 vs the old G=16
    # cap saves ~5 ms/batch of postprocessing (fewer sequential grid
    # programs; the budget still bounds the stacked working set)
    for G in (64, 32, 16, 8, 4, 2, 1):
        if B % G == 0 and G * (H + gap) * W <= budget:
            return G, gap
    return 1, gap


def _slots_kernel(
    det_ref,
    lab_ref,
    rootvals_ref,
    slot_ref,
    minx_ref,
    maxx_ref,
    nroots_ref,
    roots_smem,
    *,
    thr_logit,
    K,
    H,
    G,
    off_stride,
):
    """Per-image roots/slots/extremes from grouped-CCL labels.

    Kept separate from the CCL fixpoint kernel: this half is roll-free, so
    its (K, H) 2-D ops never meet the roll ops of the propagation rounds
    (Mosaic's layout solver rejects new multi-dim broadcasts connected to
    roll operands — see ops/rect.py notes).

    Measured r5 (do NOT redo): this phase is COMPUTE-bound, not
    grid-overhead-bound — G-stacking it like the CCL phase does not help.
    Three grouped rewrites were benchmarked at B=512/512²/K=16 against
    this kernel's 8.0 ms for the whole geometry phase (scalar-chained):
    (a) whole-stack (Hs, W) K-round loop with (G,·) per-band reductions:
    23 ms — 1-D lane<->sublane relayouts every round; (b) same with the
    per-band min as a sublane shift-doubling segmented min on (Hs, 1)
    columns: 23 ms — ~16 shift-ops/round on single-lane 1088-tile
    arrays; (c) the per-image algorithm unrolled over G bands in one
    program (static sublane slices, fused root+slot loop): 8.0 ms —
    exactly this kernel's number, proving per-program grid overhead is
    negligible and the K-round fori is already near the VPU floor
    (K=1 -> 4.7 ms, K=16 -> 8.1 ms: 0.23 ms/round ≈ theoretical).
    """
    det_logit = det_ref[0][:H]  # (H, W) — drop the group-stacking gap rows
    W = det_logit.shape[1]
    sentinel = H * W
    mask = det_logit > thr_logit
    # rebase stacked labels (row offset of this image's band) to per-image
    g = pl.program_id(0) % G
    lab = jnp.where(mask, lab_ref[0][:H] - g * off_stride, sentinel)
    rows = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    _roots_slots_extremes(
        lab, mask, rows, cols, sentinel, K, H, W,
        rootvals_ref, slot_ref, minx_ref, maxx_ref, nroots_ref, roots_smem,
    )


def _roots_slots_extremes(
    lab, mask, rows, cols, sentinel, K, H, W,
    rootvals_ref, slot_ref, minx_ref, maxx_ref, nroots_ref, roots_smem,
):
    # --- K smallest roots by iterated masked min (raster order); fori so
    # the program stays small for large K/H (an unrolled K=64 loop on big
    # arrays blows up Mosaic compile time/memory).  Results accumulate in
    # loop carries / SMEM and are written once — Mosaic cannot prove
    # alignment of dynamic lane-offset vector stores. ---
    cand0 = jnp.where(mask & (lab == rows * W + cols), lab, sentinel)
    # true component count BEFORE the top-K cut (overflow indicator for the
    # caller: num_components_total > K means slots were dropped)
    nroots_ref[0, 0, 0] = jnp.sum(jnp.where(cand0 != sentinel, 1, 0))

    def root_body(k, cand):
        r = jnp.min(cand)
        roots_smem[k] = r
        return jnp.where(cand == r, sentinel, cand)

    lax.fori_loop(0, K, root_body, cand0)
    rootvals_ref[0, 0] = jnp.stack([roots_smem[k] for k in range(K)])

    # --- compact slot map + per-row extremes ---
    # Keep this as a K-round fori over (H, W) work.  The tempting
    # alternative — one (K, H, W) membership compare with axis
    # reductions — was measured 16% SLOWER end-to-end on v5e at
    # K=16/B=512/512px (11.9k vs 14.7k img/s): the 3-D temporaries
    # (~K x H x W i32, several live at once) blow past what Mosaic keeps
    # resident, while the fori's (H, W) working set stays hot in VMEM.
    big = jnp.int32(1 << 30)
    kio = lax.broadcasted_iota(jnp.int32, (K, H), 0)

    def slot_body(k, carry):
        slot, mnx, mxx = carry
        root = roots_smem[k]
        m = lab == root
        mk = jnp.min(jnp.where(m, cols, big), axis=1)  # (H,)
        xk = jnp.max(jnp.where(m, cols, -1), axis=1)
        rowsel = kio == k  # (K, H)
        mnx = jnp.where(rowsel, mk[None, :], mnx)
        mxx = jnp.where(rowsel, xk[None, :], mxx)
        return jnp.where(m, k, slot), mnx, mxx

    slot, mnx, mxx = lax.fori_loop(
        0,
        K,
        slot_body,
        (
            jnp.full((H, W), K, jnp.int32),
            jnp.full((K, H), big, jnp.int32),
            jnp.full((K, H), -1, jnp.int32),
        ),
    )
    slot_ref[0] = slot
    minx_ref[0] = mnx
    maxx_ref[0] = mxx


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_components",
        "threshold",
        "connectivity",
        "max_iters",
        "interpret",
    ),
)
def component_slots_from_logits(
    det_logits: jax.Array,
    max_components: int,
    threshold: float = 0.5,
    connectivity: int = 8,
    max_iters: int | None = None,
    interpret: bool = False,
) -> dict:
    """(B, H, W) detection logits -> slot map + rootvals + rect extremes.

    Returns dict: rootvals (B, K) int32 (== H*W at padding), slots
    (B, H, W) int32 in 0..K (K = background), minx/maxx (B, K, H) int32.
    """
    B, H, W = det_logits.shape
    K = max_components
    if max_iters is None:
        max_iters = H + W
    thr_logit = math.log(threshold / (1.0 - threshold))

    common = dict(
        out_specs=(
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # (1,1,1) block: last two dims equal the array's so Mosaic's
            # (8,128)-divisibility rule is satisfied for any batch size
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
            jax.ShapeDtypeStruct((B, K, H), jnp.int32),
            jax.ShapeDtypeStruct((B, K, H), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((K,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    if _COMPAT:
        kernel = functools.partial(
            _geometry_kernel_compat,
            thr_logit=thr_logit,
            connectivity=connectivity,
            max_iters=max_iters,
            K=K,
        )
        rootvals, slots, minx, maxx, nroots = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            **common,
        )(det_logits.astype(jnp.float32))
        return {
            "rootvals": rootvals[:, 0],
            "slots": slots,
            "minx": minx,
            "maxx": maxx,
            "num_components_total": nroots[:, 0, 0],
        }

    # Phase 1: CCL fixpoint over G vertically-stacked images per program
    # (dead-gap rows isolate them — see _stack_group).  The stacking is a
    # pad + reshape, both layout-preserving; the grid shrinks B -> B/G, so
    # per-program overhead (sequential grid, 16-cycle ops on small maps)
    # amortizes G-fold.
    G, gap = _stack_group(det_logits)
    det32 = det_logits.astype(jnp.float32)
    stacked = jnp.pad(
        det32, ((0, 0), (0, gap), (0, 0)), constant_values=-jnp.inf
    ).reshape(B // G, G * (H + gap), W)
    Hs = G * (H + gap)
    ccl = functools.partial(
        _ccl_kernel,
        thr_logit=thr_logit,
        connectivity=connectivity,
        max_iters=max_iters,
        run_limit=H,
    )
    labs = pl.pallas_call(
        ccl,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((1, Hs, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, Hs, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B // G, Hs, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(stacked)

    # Phase 2: per-image roots/slots/extremes (roll-free kernel) reading
    # the (H+gap, W) band of image b straight out of the stacked arrays
    kernel = functools.partial(
        _slots_kernel,
        thr_logit=thr_logit,
        K=K,
        H=H,
        G=G,
        off_stride=(H + gap) * W,
    )
    band = pl.BlockSpec(
        (1, H + gap, W), lambda b: (b // G, b % G, 0), memory_space=pltpu.VMEM
    )
    rootvals, slots, minx, maxx, nroots = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[band, band],
        **common,
    )(stacked, labs)
    return {
        "rootvals": rootvals[:, 0],
        "slots": slots,
        "minx": minx,
        "maxx": maxx,
        "num_components_total": nroots[:, 0, 0],
    }


def component_stats_from_logits(
    logits: jax.Array,
    max_components: int,
    threshold: float = 0.5,
    connectivity: int = 8,
    max_iters: int | None = None,
    interpret: bool = False,
    packed_phases: tuple[int, int] | None = None,
) -> dict:
    """(B, H, W, C) logits -> per-component stats.

    Kernel for geometry (CCL/slots/extremes) + one XLA one-hot matmul for
    [areas, det-prob sums, class-prob sums].  Returns dict with (B, K)
    rootvals/areas/det_sums, (B, K, n_cls) cls_sums (dummy 1-col when
    detection-only) and (B, K, H) minx/maxx.  Padding roots == H*W.

    ``packed_phases=(py, px)``: logits arrive space-to-depth packed as
    (B, H/py, W/px, py*px*C), phase-major (context_kernel._s2d ordering,
    the large-scan s2d context route's native output).  Only the
    1-channel detection map is unpacked for the geometry kernel (the CCL
    needs true 2-D adjacency); the per-component sums are pixel-order
    invariant, so sigmoid/softmax/one-hot/einsum all run in the packed
    layout and the slot map is packed to match.  This avoids the
    full-tensor depth-to-space + the layout-conversion copies XLA inserts
    between a transposed tensor and the Pallas operand (measured ~20
    ms/batch at 2048px on v5e).
    """
    K = max_components
    if packed_phases is None:
        B, H, W, C = logits.shape
        lg = logits
        det_logit = lg[..., 0].astype(jnp.float32)
        det_full = det_logit
    else:
        py, px = packed_phases
        B, Hh, Wh, CP = logits.shape
        C = CP // (py * px)
        H, W = Hh * py, Wh * px
        # (B, Hh, Wh, py, px, C): phase-major channel split is a reshape
        lg = logits.reshape(B, Hh, Wh, py, px, C)
        det_logit = lg[..., 0].astype(jnp.float32)  # (B, Hh, Wh, py, px)
        det_full = det_logit.transpose(0, 1, 3, 2, 4).reshape(B, H, W)
    n_cls = C - 1
    geo = component_slots_from_logits(
        det_full,
        max_components=K,
        threshold=threshold,
        connectivity=connectivity,
        max_iters=max_iters,
        interpret=interpret,
    )
    if packed_phases is None:
        slots = geo["slots"]
    else:
        # pack the slot map to align with the packed features
        slots = (
            geo["slots"]
            .reshape(B, Hh, py, Wh, px)
            .transpose(0, 1, 3, 2, 4)
        )  # (B, Hh, Wh, py, px)
    # Per-component sums as three separate contractions instead of one
    # concat-einsum: nothing but the class softmax is ever materialized at
    # pixel resolution (the old path wrote f32 [ones|sigmoid|softmax] plus
    # an f32 copy of the logits — ~4.4 GB/batch of HBM at B=512 512px).
    # The one-hot is regenerated from the int32 slot map inside each
    # contraction's fusion (33 MB reads).  Summation stays f32 on the MXU;
    # in the bf16 perf route the softmax itself is stored at the logits
    # dtype (pixelwise rounding only — counts/argmax semantics unchanged,
    # and the f32 parity mode is bit-identical since ft == f32 there).
    hw = "bhw" if packed_phases is None else "bhwyx"
    prec = jax.lax.Precision.HIGHEST
    onehot = jax.nn.one_hot(slots, K, dtype=jnp.float32)  # bg -> zeros
    areas = jnp.einsum(f"{hw}k->bk", onehot, precision=prec)
    det_prob = jax.nn.sigmoid(det_logit)
    det_sums = jnp.einsum(f"{hw}k,{hw}->bk", onehot, det_prob, precision=prec)
    if n_cls > 0:
        ft = logits.dtype
        sm = jax.nn.softmax(lg[..., 1:].astype(jnp.float32), axis=-1).astype(ft)
        cls_sums = jnp.einsum(
            f"{hw}k,{hw}c->bkc",
            jax.nn.one_hot(slots, K, dtype=ft),
            sm,
            precision=prec,
            preferred_element_type=jnp.float32,
        )
    else:
        cls_sums = jnp.zeros((B, K, 1), jnp.float32)
    return {
        "rootvals": geo["rootvals"],
        "areas": areas,
        "det_sums": det_sums,
        "cls_sums": cls_sums,
        "minx": geo["minx"],
        "maxx": geo["maxx"],
        "labels": geo["slots"],
        "num_components_total": geo["num_components_total"],
    }
