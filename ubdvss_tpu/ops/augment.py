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
    scale_range: tuple[float, float] = (0.7, 1.4)
    translate_frac: float = 0.05
    flip_prob: float = 0.5  # x-mirror probability
    flip_y_prob: float = 0.0  # y-mirror probability (off by default)
    crop_frac: float = 0.0  # random crop: window side in [1-crop_frac, 1]
    brightness: float = 30.0  # additive, 0..255 domain
    contrast_range: tuple[float, float] = (0.8, 1.2)
    noise_std: float = 4.0
    fill_value: float = 255.0  # background fill for out-of-frame samples


def random_affine(key: jax.Array, cfg: AugmentConfig, hw: tuple[int, int]) -> jax.Array:
    """(2, 3) forward affine (about the image center) in (x, y) coords.

    Every factor draws from its OWN subkey — r1 drew tx and ty from one key,
    which made translation perfectly correlated (diagonal-only jitter,
    ADVICE r1).  Random crop composes a zoom-to-window affine after the
    center transform; flips mirror x and/or y before rotation.
    """
    h, w = hw
    k_ang, k_sc, k_tx, k_ty, k_fx, k_fy, k_cs, k_cx, k_cy = jax.random.split(
        key, 9
    )
    ang = jnp.radians(
        jax.random.uniform(
            k_ang, (), minval=-cfg.rotation_deg, maxval=cfg.rotation_deg
        )
    )
    sc = jax.random.uniform(
        k_sc, (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    tf = cfg.translate_frac
    tx = jax.random.uniform(k_tx, (), minval=-tf, maxval=tf) * w
    ty = jax.random.uniform(k_ty, (), minval=-tf, maxval=tf) * h
    flip_x = jnp.where(jax.random.uniform(k_fx) < cfg.flip_prob, -1.0, 1.0)
    flip_y = jnp.where(jax.random.uniform(k_fy) < cfg.flip_y_prob, -1.0, 1.0)
    c, s = jnp.cos(ang) * sc, jnp.sin(ang) * sc
    rot = jnp.stack(
        [jnp.stack([c * flip_x, -s * flip_y]), jnp.stack([s * flip_x, c * flip_y])]
    )  # mirror x/y then rotate+scale
    center = jnp.array([w / 2.0, h / 2.0])
    trans = center + jnp.stack([tx, ty]) - rot @ center
    m = jnp.concatenate([rot, trans[:, None]], axis=1)  # (2, 3)
    if cfg.crop_frac > 0.0:
        # random window of side cs (fraction of full frame) zoomed to frame:
        # p -> (p - o) / cs, composed after the center transform
        cs = jax.random.uniform(k_cs, (), minval=1.0 - cfg.crop_frac, maxval=1.0)
        ox = jax.random.uniform(k_cx, (), minval=0.0, maxval=1.0) * (1.0 - cs) * w
        oy = jax.random.uniform(k_cy, (), minval=0.0, maxval=1.0) * (1.0 - cs) * h
        crop_rot = jnp.eye(2) / cs
        crop_t = -jnp.stack([ox, oy]) / cs
        m = jnp.concatenate(
            [crop_rot @ m[:, :2], (crop_rot @ m[:, 2] + crop_t)[:, None]], axis=1
        )
    return m


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
