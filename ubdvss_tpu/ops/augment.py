"""Jit-compiled, PRNG-keyed train-time augmentation.

Replaces the reference's host-side OpenCV augmentation (SURVEY.md §1 L4,
§2a "Augmentation", §2b): random affine (rotation/scale/translation/flip)
plus photometric jitter (brightness/contrast/gaussian noise), implemented as
pure functions of an explicit ``jax.random`` key so a fixed key gives a
deterministic batch (SURVEY.md §4.3 property test).

Geometry is applied consistently to the image (inverse-map bilinear warp —
a gather-based resample on device) and to the GT polygons (forward affine on
the vertex coords); targets are rasterized *after* augmentation, like the
reference's synthesize-after-warp order (SURVEY.md §3.4).

Photometrics operate on the [0, 255] domain before normalization.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    rotation_deg: float = 15.0
    scale_range: tuple[float, float] = (0.8, 1.25)
    translate_frac: float = 0.05
    flip_prob: float = 0.5
    brightness: float = 30.0  # additive, 0..255 domain
    contrast_range: tuple[float, float] = (0.8, 1.2)
    noise_std: float = 4.0
    fill_value: float = 255.0  # background fill for out-of-frame samples


def random_affine(key: jax.Array, cfg: AugmentConfig, hw: tuple[int, int]) -> jax.Array:
    """(2, 3) forward affine (about the image center) in (x, y) coords."""
    h, w = hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ang = jnp.radians(
        jax.random.uniform(k1, (), minval=-cfg.rotation_deg, maxval=cfg.rotation_deg)
    )
    sc = jax.random.uniform(
        k2, (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    tx = jax.random.uniform(k3, (), minval=-cfg.translate_frac, maxval=cfg.translate_frac) * w
    ty = jax.random.uniform(k3, (), minval=-cfg.translate_frac, maxval=cfg.translate_frac) * h
    flip = jnp.where(jax.random.uniform(k4) < cfg.flip_prob, -1.0, 1.0)
    c, s = jnp.cos(ang) * sc, jnp.sin(ang) * sc
    rot = jnp.stack(
        [jnp.stack([c * flip, -s]), jnp.stack([s * flip, c])]
    )  # column-x flip then rotate+scale
    center = jnp.array([w / 2.0, h / 2.0])
    trans = center + jnp.stack([tx, ty]) - rot @ center
    return jnp.concatenate([rot, trans[:, None]], axis=1)  # (2, 3)


def transform_points(pts: jax.Array, matrix: jax.Array) -> jax.Array:
    """Forward-affine (..., 2) points with a (2, 3) matrix."""
    return pts @ matrix[:, :2].T + matrix[:, 2]


def _invert_affine(m: jax.Array) -> jax.Array:
    a = m[:, :2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv = (
        jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]])
        / jnp.where(det == 0, 1.0, det)
    )
    t = -inv @ m[:, 2]
    return jnp.concatenate([inv, t[:, None]], axis=1)


def affine_warp(img: jax.Array, matrix: jax.Array, fill: float) -> jax.Array:
    """Warp (H, W) image by a forward (2, 3) affine; bilinear, constant fill."""
    h, w = img.shape
    inv = _invert_affine(matrix)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    src = transform_points(jnp.stack([gx, gy], -1), inv)  # (H, W, 2)
    sx, sy = src[..., 0], src[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        return jnp.where(ok, v, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def photometric(key: jax.Array, img: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """Brightness/contrast/noise on the [0, 255] domain, clipped back."""
    k1, k2, k3 = jax.random.split(key, 3)
    b = jax.random.uniform(k1, (), minval=-cfg.brightness, maxval=cfg.brightness)
    c = jax.random.uniform(
        k2, (), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
    )
    out = (img - 127.5) * c + 127.5 + b
    out = out + jax.random.normal(k3, img.shape) * cfg.noise_std
    return jnp.clip(out, 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_sample(
    key: jax.Array, img: jax.Array, polys: jax.Array, cfg: AugmentConfig
):
    """One sample: (H, W) [0,255] image + (P, V, 2) polys -> augmented pair."""
    kg, kp = jax.random.split(key)
    m = random_affine(kg, cfg, img.shape)
    img_w = affine_warp(img, m, cfg.fill_value)
    img_w = photometric(kp, img_w, cfg)
    return img_w, transform_points(polys, m)


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key: jax.Array, imgs: jax.Array, polys: jax.Array, cfg: AugmentConfig):
    """(B, H, W) images + (B, P, V, 2) polys under per-sample subkeys."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, i, p: augment_sample(k, i, p, cfg))(keys, imgs, polys)
