"""int8 quantized inference trunk (production serving mode).

Post-training quantization of the FCN forward: symmetric int8 with
per-output-channel weight scales and per-tensor activation scales from
absmax calibration.  Every conv runs int8 x int8 -> int32 on the MXU
(double the bf16 MAC rate on v5e) and the inter-layer activations live in
HBM as int8 — half the bf16 route's traffic on the trunk, which dominates
the 512px end-to-end pipeline.  Dequant + bias + ReLU + requant are
elementwise and fuse into each conv's output.

The quantized math mirrors ``context_kernel.dense_context_head`` exactly
(same rank-1-expanded dense kernels), so the only divergence from the bf16
route is the rounding itself.  Detection equivalence on the pretrained
asset is locked by tests/test_quant.py; the mode is inference-only (the
reference has no quantized path — this is a deployment capability of the
rebuild, SURVEY.md §6 perf mandate).

Layer chain quantized (models/model.py): downscale_0 (3x3 s2, 1->C) ->
downscale_1 (3x3 s2, C->C) -> context_i (dense 3x3 dil d_i, C->C) ->
head (1x1, C->O, logits out in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def _qweight(k: jax.Array):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    Returns (q int8, scale f32 (O,)) with q = round(k / scale)."""
    absmax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dense_context_kernels(params, cfg):
    """The dense 3x3 kernels of the context module: either the layer's own
    dense kernel (separable_context=False checkpoints) or the rank-1
    expansion of its depthwise*pointwise factors — identical values to
    dense_context_head's (shared rounding)."""
    ks = []
    for li in range(len(cfg.dilations)):
        p = params[f"context_{li}"]
        if "depthwise" in p:
            dw = jnp.asarray(p["depthwise"]["kernel"], jnp.float32)  # 3,3,1,C
            pw = jnp.asarray(p["pointwise"]["kernel"], jnp.float32)  # 1,1,C,C
            C = pw.shape[-1]
            # k[ty,tx,ci,co] = dw[ty,tx,ci] * pw[ci,co] (HWIO I=ci, O=co)
            k = dw[:, :, 0, :].reshape(3, 3, C, 1) * pw[0, 0].reshape(
                1, 1, C, C
            )
            ks.append((k, jnp.asarray(p["pointwise"]["bias"], jnp.float32)))
        else:
            ks.append(
                (
                    jnp.asarray(p["kernel"], jnp.float32),
                    jnp.asarray(p["bias"], jnp.float32),
                )
            )
    return ks


def trunk_intermediates(params, x_nhwc: jax.Array, cfg):
    """f32 reference forward returning every post-ReLU activation (for
    absmax calibration) plus the logits.  x: normalized (B, H, W, 1)."""
    acts = []
    x = x_nhwc.astype(jnp.float32)
    for i in range(2):
        p = params[f"downscale_{i}"]
        x = lax.conv_general_dilated(
            x, jnp.asarray(p["kernel"], jnp.float32), (2, 2), "SAME",
            dimension_numbers=_DIMS, precision=lax.Precision.HIGHEST,
        ) + jnp.asarray(p["bias"], jnp.float32)
        x = jnp.maximum(x, 0.0)
        acts.append(x)
    for (k, b), d in zip(_dense_context_kernels(params, cfg), cfg.dilations):
        x = lax.conv_general_dilated(
            x, k, (1, 1), "SAME", rhs_dilation=(d, d),
            dimension_numbers=_DIMS, precision=lax.Precision.HIGHEST,
        ) + b
        x = jnp.maximum(x, 0.0)
        acts.append(x)
    hp = params["head"]
    logits = lax.conv_general_dilated(
        x, jnp.asarray(hp["kernel"], jnp.float32), (1, 1), "SAME",
        dimension_numbers=_DIMS, precision=lax.Precision.HIGHEST,
    ) + jnp.asarray(hp["bias"], jnp.float32)
    return acts, logits


def quantize_trunk(
    params, cfg, calib_images: jax.Array, margin: float = 1.3
) -> dict:
    """Post-training calibration + weight quantization.

    calib_images: normalized (N, H, W, 1) f32 in [-1, 1] (the data
    pipeline's ``images`` contract).  Returns the qparams pytree consumed
    by ``int8_trunk_apply``: int8 kernels, f32 biases, and per-layer
    PER-CHANNEL activation requant scales.  Per-channel activation
    quantization costs nothing at runtime: each layer's input scales fold
    into the next kernel's input-channel axis BEFORE its per-output-channel
    weight quantization, so the conv itself stays a plain int8 x int8.
    ``margin`` head-rooms the calibration absmax against unseen data
    (clipped activations, not rounding, dominated the error without it).
    """
    return build_qparams(
        params, cfg, calibrate_scales(params, cfg, calib_images, margin)
    )


def calibrate_scales(params, cfg, calib_images, margin: float = 1.3):
    """Per-layer per-channel activation requant scales from absmax over the
    calibration pool.  Merge pools of different image shapes with an
    elementwise jnp.minimum over the per-layer vectors (smaller scale =
    larger observed range), then ``build_qparams``."""
    acts, _ = jax.jit(lambda x: trunk_intermediates(params, x, cfg))(
        calib_images
    )
    # per-CHANNEL absmax of each post-ReLU activation; input is [-1, 1]
    return [jnp.full((1,), 127.0, jnp.float32)] + [
        127.0
        / (margin * jnp.maximum(jnp.max(jnp.abs(a), axis=(0, 1, 2)), 1e-12))
        for a in acts
    ]


def build_qparams(params, cfg, a_scales) -> dict:
    """Quantize the weights against the given activation scales (see
    quantize_trunk for the folding scheme)."""
    kernels = [
        (
            jnp.asarray(params[f"downscale_{i}"]["kernel"], jnp.float32),
            jnp.asarray(params[f"downscale_{i}"]["bias"], jnp.float32),
        )
        for i in range(2)
    ]
    kernels += _dense_context_kernels(params, cfg)
    hp = params["head"]
    kernels.append(
        (
            jnp.asarray(hp["kernel"], jnp.float32),
            jnp.asarray(hp["bias"], jnp.float32),
        )
    )
    layers = []
    for (k, b), s_in in zip(kernels, a_scales):
        # fold the input activation scales into the kernel: the int32
        # accumulator then equals conv(x, k) * 127-ish / ws exactly
        q, ws = _qweight(k / s_in[None, None, :, None])
        layers.append(dict(q=q, ws=ws, b=b))
    return {
        "layers": layers[:-1],
        "head": layers[-1],
        # s_in[i]: per-channel requant scales feeding layer i
        "s_in": a_scales,
    }


def _qconv(qx, layer, s_out, strides, dil):
    """int8 conv -> int32 -> fused dequant+bias+ReLU+requant -> int8.

    The input activation scales are already folded into ``layer["q"]``
    (quantize_trunk), so dequant is just the per-output-channel ws.
    s_out=None returns the f32 pre-requant activation (head/logits)."""
    acc = lax.conv_general_dilated(
        qx, layer["q"], strides, "SAME", rhs_dilation=dil,
        dimension_numbers=_DIMS, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * layer["ws"] + layer["b"]
    if s_out is None:
        return y
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y * s_out), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("cfg", "raw_gray"))
def int8_trunk_apply(qparams, x, cfg, raw_gray: bool = False) -> jax.Array:
    """Quantized FCN forward: images -> f32 logits (B, H/4, W/4, 1+n_cls).

    x: normalized (B, H, W, 1) f32 in [-1, 1], or with ``raw_gray`` raw
    [0, 255] grayscale (B, H, W) — the normalize folds into the input
    quantization (one fused round per pixel, no f32 materialization).
    Drop-in for ``fused_model_apply``: feed the logits to
    ``postprocess_batch_fused`` unchanged.
    """
    if raw_gray:
        qx = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (127.0 / 127.5) - 127.0),
            -127,
            127,
        ).astype(jnp.int8)[..., None]
    else:
        qx = (
            jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0), -127, 127)
            .astype(jnp.int8)
            .reshape(x.shape[:3] + (1,))
        )
    s = qparams["s_in"]
    L = qparams["layers"]
    qx = _qconv(qx, L[0], s[1], (2, 2), (1, 1))
    qx = _qconv(qx, L[1], s[2], (2, 2), (1, 1))
    for li, d in enumerate(cfg.dilations):
        qx = _qconv(qx, L[2 + li], s[3 + li], (1, 1), (d, d))
    return _qconv(qx, qparams["head"], None, (1, 1), (1, 1))
