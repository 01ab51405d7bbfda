"""Fused, jit-compiled image preprocessing (grayscale → resize → normalize).

Replaces the reference's host-side OpenCV preprocessing (SURVEY.md §1 L4,
§2b "OpenCV cvtColor/resize/normalize → fused jit-compiled preproc";
BASELINE.json north_star: "the image preprocessing path ... becomes a fused
jit-compiled pipeline").

Canonical numeric contract (the reference's exact uint8 fixed-point rounding
is unverifiable with the empty mount — SURVEY.md §0 — so the contract is
defined in float and shared with the in-repo oracle):
  * input: (H, W) grayscale or (H, W, 3) color, any real dtype, values
    in [0, 255];
  * grayscale: ITU-R BT.601 luma, 0.299 R + 0.587 G + 0.114 B (cv2's
    float-path coefficients);
  * resize: separable bilinear with half-pixel centers and edge clamping —
    bit-compatible with ``cv2.resize(..., INTER_LINEAR)`` on float inputs;
  * normalize: x / 127.5 - 1  →  [-1, 1].

TPU-first design: the bilinear resize is expressed as two dense
interpolation-matrix products (row matrix @ image @ col matrixᵀ) so it runs
on the MXU instead of as gather ops; the whole preprocess is one XLA
program, fusing grayscale and normalization into the matmuls' epilogues.
Identity resizes are elided at trace time (static shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 luma weights, cv2 float-path order (R, G, B).
_LUMA_RGB = (0.299, 0.587, 0.114)


def rgb_to_grayscale(img: jax.Array, channel_order: str = "rgb") -> jax.Array:
    """(..., 3) -> (...) luma.  channel_order 'rgb' or 'bgr' (cv2.imread)."""
    w = jnp.asarray(
        _LUMA_RGB if channel_order == "rgb" else _LUMA_RGB[::-1], img.dtype
    )
    return img @ w


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, cv2 INTER_LINEAR
    convention: src = (dst + 0.5) * n_in/n_out - 0.5, clamped to edges."""
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = (src - i0).astype(np.float32)
    i0c = np.clip(i0, 0, n_in - 1)
    i1c = np.clip(i0 + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0c), 1.0 - frac)
    np.add.at(m, (rows, i1c), frac)
    return m


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of (H, W) or (H, W, C) to out_hw via MXU matmuls."""
    h_in, w_in = img.shape[:2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return img
    mh = jnp.asarray(_resize_matrix(h_in, h_out))
    mw = jnp.asarray(_resize_matrix(w_in, w_out))
    x = img.astype(jnp.float32)
    # rows: (H_out, H_in) @ (H_in, W_in[, C]); cols analogous.
    x = jnp.tensordot(mh, x, axes=[[1], [0]])
    x = jnp.tensordot(mw, x, axes=[[1], [1]])  # -> (W_out, H_out[, C])
    x = jnp.swapaxes(x, 0, 1)
    return x


def normalize(x: jax.Array) -> jax.Array:
    """[0, 255] -> [-1, 1]."""
    return x.astype(jnp.float32) * (1.0 / 127.5) - 1.0


@functools.partial(jax.jit, static_argnames=("out_hw", "channel_order"))
def preprocess(
    img: jax.Array, out_hw: tuple[int, int], channel_order: str = "rgb"
) -> jax.Array:
    """Full fused pipeline: image -> (H', W', 1) normalized grayscale f32."""
    x = img.astype(jnp.float32)
    if x.ndim == 3:
        if x.shape[-1] == 1:
            x = x[..., 0]
        else:
            x = rgb_to_grayscale(x, channel_order)
    x = resize_bilinear(x, out_hw)
    x = normalize(x)
    return x[..., None]


def preprocess_batch(
    imgs: jax.Array, out_hw: tuple[int, int], channel_order: str = "rgb"
) -> jax.Array:
    """(B, H, W[, C]) -> (B, H', W', 1); all images share one input shape."""
    return jax.vmap(lambda im: preprocess(im, out_hw, channel_order))(imgs)

