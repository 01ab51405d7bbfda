"""Pallas TPU kernel: the fused dilated-separable context module + head.

BASELINE.json north_star: "the tiny dilated-convolution context-module FCN
is reimplemented with Pallas-fused conv+activation blocks for both inference
and pixelwise-loss training."

One grid program per image keeps the whole activation (C=24 at H/4 — ~1.6MB
in channel-major (C, H, W) layout, which tiles onto (8,128) with no lane
padding, unlike NHWC C=24) resident in VMEM across ALL context layers and
the 1x1 head: HBM sees one read of the stem output and one write of the
logits instead of ~9 per-layer round trips.

Per layer, fused in-register:
  * depthwise 3x3 dilation-d conv = 9 shifted multiply-accumulates
    (roll + edge-mask shifts, zero padding == SAME conv semantics);
  * pointwise 1x1 conv = a (C_out, C_in) x (C_in, H, W) `dot_general`
    on the MXU;
  * bias add + ReLU.

Training support: `fused_context_head` carries a custom VJP whose backward
differentiates the numerically-identical XLA formulation
(`context_head_reference`), so gradients are exact and the fused forward
can sit inside the jitted train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ubdvss_tpu.ops.pallas.ccl_kernel import _shift


def _context_kernel(
    x_ref, dw_ref, pwt_ref, pb_ref, hwt_ref, hb_ref, out_ref, acc_ref,
    *, dilations, C, O, with_head
):
    x = x_ref[0]  # (C, H, W)
    for li, d in enumerate(dilations):
        w9 = dw_ref[li]  # (9, C, 1, 1) -> taps index to (C, 1, 1)
        # accumulate taps through a VMEM scratch ref — as SSA temps Mosaic
        # keeps all 9 shifted copies live and blows the scoped-VMEM budget
        acc_ref[:] = x * w9[4]
        t = 0
        for ty in (-1, 0, 1):
            for tx in (-1, 0, 1):
                if ty == 0 and tx == 0:
                    t += 1
                    continue
                xs = x
                if ty:
                    xs = _shift(xs, -ty * d, 1, 0.0)
                if tx:
                    xs = _shift(xs, -tx * d, 2, 0.0)
                acc_ref[:] = acc_ref[:] + xs * w9[t]
                t += 1
        y = acc_ref[:]
        # pointwise: (C_out, C_in) @ (C_in, H, W) on the MXU
        y = lax.dot_general(
            pwt_ref[li],
            y,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        x = jnp.maximum(y + pb_ref[li], 0.0)
    if with_head:
        x = lax.dot_general(
            hwt_ref[:], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ) + hb_ref[:]
    out_ref[0] = x


def _pack_weights(params, dilations):
    """flax param tree -> kernel weight tensors (see BarcodeFCN naming)."""
    L = len(dilations)
    dws, pwts, pbs = [], [], []
    for i in range(L):
        p = params[f"context_{i}"]
        dk = jnp.asarray(p["depthwise"]["kernel"], jnp.float32)  # (3,3,1,C)
        dws.append(dk[:, :, 0, :].reshape(9, -1)[:, :, None, None])
        pk = jnp.asarray(p["pointwise"]["kernel"], jnp.float32)  # (1,1,C,C)
        pwts.append(pk[0, 0].T)  # (C_out, C_in)
        pbs.append(jnp.asarray(p["pointwise"]["bias"], jnp.float32)[:, None, None])
    hw = jnp.asarray(params["head"]["kernel"], jnp.float32)[0, 0]  # (C, O)
    hb = jnp.asarray(params["head"]["bias"], jnp.float32)
    return (
        jnp.stack(dws),  # (L, 9, C, 1, 1)
        jnp.stack(pwts),  # (L, C, C)
        jnp.stack(pbs),  # (L, C, 1, 1)
        hw.T,  # (O, C)
        hb[:, None, None],  # (O, 1, 1)
    )


_LAYERS_PER_KERNEL = 7  # all context layers + head in one program


def _pallas_chunk(x_nchw, dw, pwt, pb, hwt, hb, dilations, with_head, interpret):
    B, C, H, W = x_nchw.shape
    O = hwt.shape[0] if with_head else C
    kernel = functools.partial(
        _context_kernel, dilations=dilations, C=C, O=O, with_head=with_head
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dw.shape, lambda b: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pwt.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pb.shape, lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(hwt.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(hb.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, O, H, W), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, O, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, H, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_nchw.astype(jnp.float32), dw, pwt, pb, hwt, hb)


@functools.partial(jax.jit, static_argnames=("dilations", "interpret"))
def _pallas_context_head(x_nchw, dw, pwt, pb, hwt, hb, dilations, interpret=False):
    L = len(dilations)
    x = x_nchw
    for start in range(0, L, _LAYERS_PER_KERNEL):
        stop = min(start + _LAYERS_PER_KERNEL, L)
        x = _pallas_chunk(
            x,
            dw[start:stop],
            pwt[start:stop],
            pb[start:stop],
            hwt,
            hb,
            tuple(dilations[start:stop]),
            with_head=(stop == L),
            interpret=interpret,
        )
    return x


def context_head_reference(x_nchw, dw, pwt, pb, hwt, hb, dilations):
    """Numerically-identical XLA formulation (differentiable; also the
    source of the custom-VJP backward)."""

    def shift(x, d, axis):
        n = x.shape[axis]
        r = jnp.roll(x, d, axis)
        idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
        keep = (idx >= d) if d > 0 else (idx < n + d)
        return jnp.where(keep, r, 0.0)

    x = x_nchw.astype(jnp.float32)
    for li, d in enumerate(dilations):
        acc = 0.0
        t = 0
        for ty in (-1, 0, 1):
            for tx in (-1, 0, 1):
                xs = x
                if ty:
                    xs = shift(xs, -ty * d, 2)
                if tx:
                    xs = shift(xs, -tx * d, 3)
                acc = acc + xs * dw[li, t][None]
                t += 1
        y = jnp.einsum(
            "oc,bchw->bohw", pwt[li], acc,
            precision=lax.Precision.HIGHEST,
        )
        x = jnp.maximum(y + pb[li][None], 0.0)
    logits = jnp.einsum(
        "oc,bchw->bohw", hwt, x, precision=lax.Precision.HIGHEST
    )
    return logits + hb[None]


def dense_context_head(
    x_nhwc, dw, pwt, pb, hwt, hb, dilations,
    precision=lax.Precision.DEFAULT,
    act_dtype=jnp.float32,
    act_out=False,
):
    """Large-image context module: each separable layer collapsed into ONE
    dense 3x3 dilated MXU conv (kernel[ty,tx,ci,co] = dw[ty,tx,ci]*pw[co,ci]
    — the rank-1 factorization expanded, so the math is the separable
    layer's exactly).

    Why it exists: the Pallas kernel's Mosaic compile time grows
    superlinearly with the VMEM-resident image area (measured on v5e:
    128x128 ≈ 90 s, 256x256 > 10 min — the round-1 1024px cap), while the
    dense conv is one HBM pass per layer through XLA's native convolution
    emitter at any size.  At DEFAULT precision (one bf16 MXU pass, f32
    accumulation) logits differ from the f32 reference by ~2.5e-3 — far
    inside detection margins (equivalence locked by
    tests/test_context_kernel.py::test_dense_path_detections_match);
    pass HIGHEST for ~1e-7 parity at 3.7x the cost.

    ``act_dtype=bfloat16`` stores the inter-layer activations in bf16 —
    halves the HBM round-trip per layer, which is what bounds this path
    (the convs accumulate in f32 on the MXU either way); used by the bf16
    perf route.  NHWC in / NHWC logits out (f32).
    """
    C = pwt.shape[-1]
    x = x_nhwc.astype(act_dtype)
    zero = jnp.zeros((), act_dtype)
    for li, d in enumerate(dilations):
        k = dw[li, :, :, 0, 0].reshape(3, 3, C, 1) * pwt[li].T.reshape(1, 1, C, C)
        y = lax.conv_general_dilated(
            x, k.astype(act_dtype), (1, 1), "SAME", rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        )
        x = jnp.maximum(y + pb[li][:, 0, 0].astype(act_dtype), zero)
    out = lax.conv_general_dilated(
        x, hwt.T.reshape(1, 1, C, -1).astype(act_dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    ) + hb[:, 0, 0].astype(act_dtype)
    # act_out: hand logits over at act_dtype — the bf16 route's f32 logits
    # are exact converts of these values, so consumers doing f32 math on
    # them (sigmoid/softmax in postprocessing) see identical numbers while
    # the full-size f32 materialization becomes dead code when unused
    return out if act_out else out.astype(jnp.float32)


def _s2d(x):
    """Space-to-depth s=2: (B, H, W, C) -> (B, H/2, W/2, 4C), phase-major
    channels c' = (2*pi + pj)*C + c for source pixel (2i+pi, 2j+pj)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2, 4 * C)


def _d2s(x, C):
    """Inverse of ``_s2d``."""
    B, Hh, Wh, _ = x.shape
    x = x.reshape(B, Hh, Wh, 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, Hh * 2, Wh * 2, C)


def _pack_s2d_kernel(k, d):
    """Dense 3x3 dil-``d`` kernel (3, 3, C, Co) -> the (3, 3, 4C, 4Co)
    kernel of the EXACT same conv on s=2 space-to-depth-packed tensors,
    plus its packed rhs_dilation.

    Even d: each phase convolves independently at dilation d/2 (a tap at
    offset d*t lands on the same phase, packed offset (d/2)*t) — the packed
    kernel is block-diagonal over phases.  d == 1: taps cross phases; tap
    (ty, tx) for output phase (qi, qj) reads input phase ((qi+ty) mod 2,
    (qj+tx) mod 2) at packed offset (floor((qi+ty)/2), floor((qj+tx)/2)),
    all within a 3x3 footprint.  SAME zero-padding in packed space is
    exactly SAME padding in the original space (padding commutes with the
    phase decomposition), so borders match bit-for-bit.  Built with jnp ops
    from the SAME kernel values as ``dense_context_head`` so the two paths
    share rounding (tests/test_context_kernel.py::test_s2d_context_matches).
    """
    C, Co = k.shape[2], k.shape[3]
    KP = jnp.zeros((3, 3, 4 * C, 4 * Co), k.dtype)
    if d % 2 == 0:
        for p in range(4):
            KP = KP.at[
                :, :, p * C:(p + 1) * C, p * Co:(p + 1) * Co
            ].set(k)
        return KP, d // 2
    if d != 1:
        raise ValueError(f"odd dilation {d} != 1 unsupported by s2d packing")
    for qi in range(2):
        for qj in range(2):
            q = 2 * qi + qj
            for ty in (-1, 0, 1):
                for tx in (-1, 0, 1):
                    p = 2 * ((qi + ty) % 2) + (qj + tx) % 2
                    KP = KP.at[
                        (qi + ty) // 2 + 1,
                        (qj + tx) // 2 + 1,
                        p * C:(p + 1) * C,
                        q * Co:(q + 1) * Co,
                    ].set(k[ty + 1, tx + 1])
    return KP, 1


def _pack_stride2_kernel(k):
    """(3, 3, Ci, Co) stride-2 SAME conv kernel -> the (3, 3, 4Ci, 4Co)
    kernel of the SAME conv taking s=2-packed input to s=2-packed output.

    Per axis: output cell j phase q is original output pixel 2j+q, which
    reads original input pixels 2(2j+q)+t for taps t in {0, 1, 2} (SAME
    for stride 2 / kernel 3 / even size pads 0 left, 1 right, so the
    window starts at 2*o).  2(2j+q)+t = input cell 2j + (2q+t)//2, phase
    (2q+t) % 2 — a packed conv with stride 2, footprint 3 cells, and
    explicit padding ((0, 1), (0, 1)); padded cells are zeros exactly
    where the original SAME padding supplies zeros (out-of-range phases
    carry zero kernel blocks).  The (t, q) -> (cell, phase) map is
    injective per q, so blocks are disjoint."""
    Ci, Co = k.shape[2], k.shape[3]
    KP = jnp.zeros((3, 3, 4 * Ci, 4 * Co), k.dtype)
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            for ty in range(3):
                for tx in range(3):
                    dy, py = divmod(2 * qy + ty, 2)
                    dx, px = divmod(2 * qx + tx, 2)
                    p = 2 * py + px
                    KP = KP.at[
                        dy, dx, p * Ci:(p + 1) * Ci, q * Co:(q + 1) * Co
                    ].set(k[ty, tx])
    return KP


def packed_stem_apply(
    params, x_nhwc: jax.Array, cfg, raw_gray: bool = False,
    large: bool | None = None,
) -> jax.Array:
    """``stem_apply`` computed entirely in s=2-packed layout: returns
    ``_s2d(stem_apply(...))`` — (B, H/8, W/8, 4*C) phase-major features —
    with ONE input transpose and no strip tiling.

    The large-scan trunk's remaining cost after the s2d context was the
    stem: whole-image stride-2 convs at 2048px run in XLA's degraded
    large-spatial regime (27 ms/batch) and row strips still pay ~11
    ms/batch of misaligned bias+relu fusions.  Packing input pixels 2x2
    into channels turns each stride-2 SAME conv into a stride-2 packed
    conv between packed grids (_pack_stride2_kernel), so both stem convs
    run on quarter-area maps with 4x the channels and their output feeds
    ``s2d_context_head(packed_in=True)`` directly.  Requires H, W
    divisible by 8; numerics match stem_apply (same dtype/precision
    regime, tests/test_context_kernel.py::test_packed_stem_matches).
    """
    B, H, W, _ = x_nhwc.shape
    assert H % 8 == 0 and W % 8 == 0, "packed stem needs H, W % 8 == 0"
    if large is None:
        large = (H // 4) * (W // 4) > 128 * 128
    stem_dtype = jnp.dtype(cfg.dtype)
    prec = (
        lax.Precision.DEFAULT
        if (stem_dtype == jnp.bfloat16 or large)
        else lax.Precision.HIGHEST
    )
    dims = ("NHWC", "HWIO", "NHWC")
    pad = ((0, 1), (0, 1))
    x = _s2d(x_nhwc.astype(stem_dtype))  # (B, H/2, W/2, 4)
    for i in range(2):
        p = params[f"downscale_{i}"]
        k32 = jnp.asarray(p["kernel"], jnp.float32)
        bias = jnp.tile(jnp.asarray(p["bias"], stem_dtype), 4)
        if i == 0 and raw_gray:
            # fold x/127.5 - 1 into the conv (see stem_apply): scale the
            # kernel, subtract the packed in-bounds tap-sum constant map
            KPs = _pack_stride2_kernel(
                (k32 * (1.0 / 127.5)).astype(stem_dtype)
            )
            KPc = _pack_stride2_kernel(k32.astype(stem_dtype))
            ones = jnp.ones((1,) + x.shape[1:3] + (4,), stem_dtype)
            corr = lax.conv_general_dilated(
                ones, KPc, (2, 2), pad,
                dimension_numbers=dims, precision=prec,
            )
            x = (
                lax.conv_general_dilated(
                    x, KPs, (2, 2), pad,
                    dimension_numbers=dims, precision=prec,
                )
                - corr
                + bias
            )
        else:
            KP = _pack_stride2_kernel(k32.astype(stem_dtype))
            x = lax.conv_general_dilated(
                x, KP, (2, 2), pad,
                dimension_numbers=dims, precision=prec,
            ) + bias
        x = jnp.maximum(x, jnp.zeros((), stem_dtype))
    return x.astype(jnp.float32)  # (B, H/8, W/8, 4*C) s2-packed


def s2d_context_head(
    x_nhwc, dw, pwt, pb, hwt, hb, dilations,
    precision=lax.Precision.DEFAULT,
    act_dtype=jnp.float32,
    unpack=True,
    packed_in=False,
    act_out=False,
):
    """``dense_context_head`` on s=2 space-to-depth-packed activations —
    the large-map route.

    Why: XLA's conv emitter collapses on big spatial maps with C=24 (the
    24-lane kernel uses ~3% of the 128-wide MXU; measured 44 ms/batch at
    (16, 512, 512, 24) bf16 on v5e).  Packing 2x2 pixels into channels
    quarters the map and runs 96-channel convs — 4x the nominal FLOPs via
    block-diagonal kernels but ~16x the MXU lane utilization — measured
    23.4 ms on the same workload, with one transpose in and one out
    (tiling approaches lose their gains to slice/concat data movement).
    Wins only where the emitter is degraded: routed when Hf*Wf > 256*256;
    at (256, 128, 128, 24) the dense path is faster (10.3 vs 14.0 ms).
    Math is exact per ``_pack_s2d_kernel``; odd input sizes fall back to
    ``dense_context_head``.
    """
    if packed_in:
        # features already s2-packed phase-major (packed_stem_apply)
        C = x_nhwc.shape[-1] // 4
        x = x_nhwc.astype(act_dtype)
    else:
        B, H, W, C = x_nhwc.shape
        if H % 2 or W % 2:
            return dense_context_head(
                x_nhwc, dw, pwt, pb, hwt, hb, dilations, precision, act_dtype,
                act_out=act_out,
            )
        x = _s2d(x_nhwc.astype(act_dtype))
    zero = jnp.zeros((), act_dtype)
    for li, d in enumerate(dilations):
        k = dw[li, :, :, 0, 0].reshape(3, 3, C, 1) * pwt[li].T.reshape(1, 1, C, C)
        KP, dp = _pack_s2d_kernel(k.astype(act_dtype), d)
        y = lax.conv_general_dilated(
            x, KP, (1, 1), "SAME", rhs_dilation=(dp, dp),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        )
        x = jnp.maximum(y + jnp.tile(pb[li][:, 0, 0].astype(act_dtype), 4), zero)
    # 1x1 head: block-diagonal over phases (each phase maps C -> O)
    O = hwt.shape[0]
    hk = hwt.T.astype(act_dtype)  # (C, O)
    KH = jnp.zeros((1, 1, 4 * C, 4 * O), act_dtype)
    for p in range(4):
        KH = KH.at[0, 0, p * C:(p + 1) * C, p * O:(p + 1) * O].set(hk)
    out = lax.conv_general_dilated(
        x, KH, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    ) + jnp.tile(hb[:, 0, 0].astype(act_dtype), 4)
    if not unpack:
        # phase-major packed logits (B, H/2, W/2, 4*O) — consumers that
        # are pixel-order invariant (postprocess_batch_fused
        # packed_phases=(2, 2)) skip the depth-to-space entirely; XLA
        # inserts ~20 ms/batch of layout copies at 2048px when a
        # transposed tensor meets the Pallas kernel operand.
        return out if act_out else out.astype(jnp.float32)
    out = _d2s(out, O)
    return out if act_out else out.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_context_head(x_nchw, dw, pwt, pb, hwt, hb, dilations, interpret=False):
    """Fused Pallas forward with exact gradients (XLA-differentiated bwd)."""
    return _pallas_context_head(x_nchw, dw, pwt, pb, hwt, hb, dilations, interpret)


def _fch_fwd(x, dw, pwt, pb, hwt, hb, dilations, interpret):
    out = _pallas_context_head(x, dw, pwt, pb, hwt, hb, dilations, interpret)
    return out, (x, dw, pwt, pb, hwt, hb)


def _fch_bwd(dilations, interpret, res, g):
    x, dw, pwt, pb, hwt, hb = res
    _, vjp = jax.vjp(
        lambda *a: context_head_reference(*a, dilations=dilations),
        x, dw, pwt, pb, hwt, hb,
    )
    return vjp(g)


fused_context_head.defvjp(_fch_fwd, _fch_bwd)


def stem_apply(
    params, x_nhwc: jax.Array, cfg, raw_gray: bool = False,
    large: bool | None = None,
) -> jax.Array:
    """Downscale stem only: two stride-2 SAME convs -> (B, H/4, W/4, C) f32
    features.  ``large`` pins the precision regime explicitly (tiled
    callers pass the WHOLE image's regime so tile numerics match the
    untiled program); None derives it from this input's shape.

    ``raw_gray=True``: input is UNNORMALIZED grayscale [0, 255] and the
    x/127.5 - 1 normalization is folded into the first conv — conv(x/s - 1)
    = conv(x, k/s) - conv(ones, k), where conv(ones, k) is a constant map
    (XLA folds it) that is exact at SAME-padding borders where fewer taps
    are in-bounds.  Skips the full-resolution normalized-image
    materialization (~270 MB/batch at B=256 512px) on the inference path.
    """
    # f32 + HIGHEST hits the <=1e-5 oracle-parity bar; cfg.dtype='bfloat16'
    # is the perf mode (~5x faster stem, F1-equivalent —
    # tests/test_context_kernel.py::test_bf16_stem).  Large images (feature
    # maps past the Pallas-kernel size, which route to dense_context_head)
    # run the whole program at DEFAULT precision — one bf16 MXU pass with
    # f32 accumulation (measured 3x on the stem; detection equivalence
    # locked by test_dense_path_detections_match).
    if large is None:
        large = (x_nhwc.shape[1] // 4) * (x_nhwc.shape[2] // 4) > 128 * 128
    stem_dtype = jnp.dtype(cfg.dtype)
    prec = (
        lax.Precision.DEFAULT
        if (stem_dtype == jnp.bfloat16 or large)
        else lax.Precision.HIGHEST
    )
    x = x_nhwc.astype(stem_dtype)
    dims = ("NHWC", "HWIO", "NHWC")
    for i in range(2):
        p = params[f"downscale_{i}"]
        if i == 0 and raw_gray:
            k32 = jnp.asarray(p["kernel"], jnp.float32)
            ks = (k32 * (1.0 / 127.5)).astype(stem_dtype)
            ones = jnp.ones((1,) + x.shape[1:3] + (1,), stem_dtype)
            corr = lax.conv_general_dilated(
                ones, k32.astype(stem_dtype), (2, 2), "SAME",
                dimension_numbers=dims, precision=prec,
            )  # constant (1, H/2, W/2, C): in-bounds tap sums
            x = (
                lax.conv_general_dilated(
                    x, ks, (2, 2), "SAME",
                    dimension_numbers=dims, precision=prec,
                )
                - corr
                + jnp.asarray(p["bias"], stem_dtype)
            )
        else:
            x = lax.conv_general_dilated(
                x,
                jnp.asarray(p["kernel"], stem_dtype),
                window_strides=(2, 2),
                padding="SAME",
                dimension_numbers=dims,
                precision=prec,
            ) + jnp.asarray(p["bias"], stem_dtype)
        x = jnp.maximum(x, jnp.zeros((), stem_dtype))
    return x.astype(jnp.float32)


def _s2d_route_selected(cfg, Hf, Wf, large, interpret=False) -> bool:
    """True when the context module runs the s2d-packed formulation: the
    bf16/large regime, very large maps, even sizes, s2d-compatible
    dilations (even or 1)."""
    stem_dtype = jnp.dtype(cfg.dtype)
    return (
        not interpret
        and (stem_dtype == jnp.bfloat16 or large)
        and all(d == 1 or d % 2 == 0 for d in cfg.dilations)
        and Hf * Wf > 256 * 256
        and Hf % 2 == 0
        and Wf % 2 == 0
    )


def packed_trunk_selected(cfg, out_hw) -> bool:
    """True when the whole trunk can run in s=2-packed layout (the fastest
    large-scan formulation): scale-4 separable architecture, dims divisible
    by 8, s2d-compatible dilations, and feature maps at least 256x256
    (measured on v5e: packed wins at 1024px+ inputs — 22.3 vs 23.7
    ms/batch at 1024, 2x at 2048 — and loses below, 18.3 vs 13.0 at
    512px)."""
    H, W = out_hw
    return (
        cfg.scale == 4
        and H % 8 == 0
        and W % 8 == 0
        and cfg.separable_context
        and all(d == 1 or d % 2 == 0 for d in cfg.dilations)
        and (H // 4) * (W // 4) >= 256 * 256
    )


def packed_fused_trunk(
    params, x_nhwc: jax.Array, cfg, raw_gray: bool = False,
    act_out: bool = False,
) -> jax.Array:
    """Large-scan FCN forward entirely in s=2-packed layout: packed stem
    (packed_stem_apply) + packed context (s2d_context_head packed_in) —
    ONE input transpose, no strip tiling, no depth-to-space.  Returns
    phase-major packed logits (B, H/8, W/8, 4*O) for
    ``postprocess_batch_fused(packed_phases=(2, 2))``; unpacked logits are
    ``_d2s(result, O)``.  Numerics equal fused_model_apply's large/bf16
    regime (tests/test_context_kernel.py::test_packed_trunk_matches)."""
    large = (x_nhwc.shape[1] // 4) * (x_nhwc.shape[2] // 4) > 128 * 128
    feat = packed_stem_apply(
        params, x_nhwc, cfg, raw_gray=raw_gray, large=large
    )
    stem_dtype = jnp.dtype(cfg.dtype)
    dw, pwt, pb, hwt, hb = _pack_weights(params, tuple(cfg.dilations))
    return s2d_context_head(
        feat, dw, pwt, pb, hwt, hb, tuple(cfg.dilations),
        act_dtype=jnp.bfloat16 if stem_dtype == jnp.bfloat16 else jnp.float32,
        unpack=False,
        packed_in=True,
        act_out=act_out,
    )


def context_head_route_maybe_packed(
    params, feat: jax.Array, cfg, large: bool | None = None,
    act_out: bool = False,
):
    """``context_head_route`` that hands the s2d route's logits over in
    their native packed layout: returns (logits, packed_phases) where
    packed_phases is (2, 2) — phase-major (B, Hf/2, Wf/2, 4*O) — when the
    s2d route fired, else None with ordinary (B, Hf, Wf, O) logits.  Pair
    with postprocess_batch_fused(packed_phases=...) to skip the
    depth-to-space and its layout-copy tax entirely."""
    if large is None:
        large = feat.shape[1] * feat.shape[2] > 128 * 128
    if not _s2d_route_selected(cfg, feat.shape[1], feat.shape[2], large):
        return (
            context_head_route(params, feat, cfg, large=large, act_out=act_out),
            None,
        )
    stem_dtype = jnp.dtype(cfg.dtype)
    dw, pwt, pb, hwt, hb = _pack_weights(params, tuple(cfg.dilations))
    out = s2d_context_head(
        feat, dw, pwt, pb, hwt, hb, tuple(cfg.dilations),
        act_dtype=jnp.bfloat16 if stem_dtype == jnp.bfloat16 else jnp.float32,
        unpack=False,
        act_out=act_out,
    )
    return out, (2, 2)


def context_head_route(
    params, feat: jax.Array, cfg, large: bool | None = None,
    interpret: bool = False,
    act_out: bool = False,
) -> jax.Array:
    """Context module + 1x1 head over stem features (B, Hf, Wf, C) f32 ->
    (B, Hf, Wf, O) logits, picking the fastest equivalent formulation.
    ``large`` as in ``stem_apply``."""
    x = feat
    if large is None:
        large = x.shape[1] * x.shape[2] > 128 * 128
    stem_dtype = jnp.dtype(cfg.dtype)
    dw, pwt, pb, hwt, hb = _pack_weights(params, tuple(cfg.dilations))
    Hf, Wf = x.shape[1], x.shape[2]
    # Path selection (measured on v5e, see dense_context_head docstring):
    #   * bf16 perf mode routes to the dense-equivalent MXU convs at DEFAULT
    #     precision — measured 12.5 ms/batch at B=256 128x128 features vs
    #     23.9 ms for the VMEM-resident Pallas kernel, whose 9-tap shift-MAC
    #     depthwise is VPU-bound (the MXU only sees the tiny 24x24
    #     pointwise); numerics are the bf16 route's anyway;
    #   * Pallas VMEM-resident kernel — the f32 ≤1e-5-parity fused path, but
    #     Mosaic's in-kernel (C, H, W) matmul merges H*W onto lanes (needs
    #     128-multiple W) and its compile time explodes past ~128x128 maps;
    #   * dense-equivalent MXU convs — any size, one HBM pass per layer
    #     (breaks round 1's 1024px fused-path cap: 2048px scans now run a
    #     fully fused program instead of falling back to slow XLA postproc);
    #   * identical-math XLA shifts — small unaligned maps.
    if not interpret and (stem_dtype == jnp.bfloat16 or large):
        # very large maps route through the s2d-packed formulation (see
        # s2d_context_head: 1.9x on 512x512 maps, a wash or loss below)
        head = (
            s2d_context_head
            if _s2d_route_selected(cfg, Hf, Wf, large, interpret)
            else dense_context_head
        )
        return head(
            x, dw, pwt, pb, hwt, hb, tuple(cfg.dilations),
            act_dtype=(
                jnp.bfloat16 if stem_dtype == jnp.bfloat16 else jnp.float32
            ),
            act_out=act_out,
        )
    if interpret or (Wf % 128 == 0 and Hf * Wf <= 128 * 128):
        xc = jnp.transpose(x, (0, 3, 1, 2))  # NCHW for the kernel
        logits = fused_context_head(
            xc, dw, pwt, pb, hwt, hb, tuple(cfg.dilations), interpret
        )
        return jnp.transpose(logits, (0, 2, 3, 1))  # NHWC
    logits = context_head_reference(
        jnp.transpose(x, (0, 3, 1, 2)), dw, pwt, pb, hwt, hb, tuple(cfg.dilations)
    )
    return jnp.transpose(logits, (0, 2, 3, 1))  # NHWC


def fused_model_apply(
    params, x_nhwc: jax.Array, cfg, interpret: bool = False,
    raw_gray: bool = False,
    act_out: bool = False,
) -> jax.Array:
    """Full FCN forward with the fused context module + head.

    Numerically equivalent to ``get_model(cfg).apply`` for separable-context
    configs (asserted ≤1e-5 in tests/test_context_kernel.py); differentiable
    (exact custom VJP on the Pallas route), NHWC in / NHWC logits out.
    Composition of ``stem_apply`` + ``context_head_route`` — large-scan
    callers tile the two stages separately instead
    (ops/strips.py:two_stage_tiled_trunk).
    """
    assert cfg.separable_context, "fused path implements the separable module"
    large = (x_nhwc.shape[1] // 4) * (x_nhwc.shape[2] // 4) > 128 * 128
    feat = stem_apply(params, x_nhwc, cfg, raw_gray=raw_gray, large=large)
    return context_head_route(
        params, feat, cfg, large=large, interpret=interpret, act_out=act_out
    )
