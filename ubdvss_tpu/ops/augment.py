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
import math

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


def affine_warp_gather(img: jax.Array, matrix: jax.Array, fill: float) -> jax.Array:
    """Reference warp: per-pixel 4-tap gather bilinear (exact semantics).

    Kept as the correctness oracle for :func:`affine_warp`.  Do NOT use on
    the hot path: arbitrary per-pixel gathers serialize on TPU (measured
    2.9 s for a 128x512x512 batch vs ~5 ms for the gather-free route).
    """
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


def _resample_axis0(
    img: jax.Array,
    a: jax.Array,
    b: jax.Array,
    c: jax.Array,
    fill: float,
    max_shear: float,
) -> jax.Array:
    """Gather-free 1-D resample along axis 0 at positions affine in (y, x).

    Returns out with out[y, x] = linear-interp of img at source row
    ``V(y, x) = a*y + b + c*x`` (column x unchanged), constant ``fill``
    outside [0, H).  |c| must be <= ``max_shear`` (static); |a|, |b| are
    unconstrained (out-of-frame rows resolve to fill via an exact mask).

    TPU-native formulation — per-pixel gathers serialize on TPU, and so
    does the batched coarse gather this used in rounds 3-4a (a vmapped
    per-column-block dynamic_slice: under vmap over the batch XLA lowers
    it to a WHILE loop of dynamic-update-slices — profiled as the top two
    device ops of the warp at ~2/3 of its runtime).  The shear is instead
    decomposed into THREE one-hot levels of STATICALLY-shifted slices
    (granule 32 → granule 4 → two-tap fractional), each level a weighted
    sum of row-slices that XLA fuses into one VPU pass — no dynamic
    indexing anywhere:

      1-3. shear: Q(x) = c*(x - W/2) + ext in [0, 2*ext] splits as
           Q = 32*t + 4*u + i + f; each level contracts its one-hot
           per-column weight with <= ~11 statically-offset row slices;
      4.   row scale: ``a*y + b`` becomes a per-sample (H, H+2*EXT)
           two-diagonal interpolation matrix contracted on the MXU
           (precision HIGH: one-hot rows stay exact in the bf16 3-pass
           split since 1.0 has an exact bf16 representation).

    The shear levels then stage-4 compose two 1-D lerps (the three shear
    levels are exact integer selection + one fractional lerp — together
    exactly the two-tap row interp the old stage-1/2 computed); for
    axis-aligned transforms (c == 0 or integer positions) the result is
    bit-identical to bilinear, under shear it is a slightly softer but
    valid resampler.
    """
    hs, w0 = img.shape
    w = w0
    # EXT covers the worst-case shear reach |c|*W/2 about the column
    # center, so stage-4's frame contains every source row that can map
    # in-frame; G additionally covers the level-1 slice overhang
    # (32*t_max + level-2/3 reach below).
    ext = int(math.ceil(max_shear * w / 2)) + 4
    g = 2 * ext + 40
    # Replicate-pad the rows: padding with `fill` would let the composed
    # (shear then scale) kernel — which is ~1 px wider than bilinear —
    # bleed fill INTO the frame near the edges (measured up to ~1.4 px /
    # 20% fill weight on shears).  With edge replication the resample is
    # pure content; the oracle's exact 1-px partial-fill profile is then
    # applied analytically at the end via the coverage blend below.
    img_pad = jnp.pad(img, ((g, g), (0, 0)), mode="edge")

    xs = jnp.arange(w, dtype=jnp.float32)
    q = c * (xs - w0 / 2.0)  # per-column shear offset, centered
    jm = hs + 2 * ext
    base = g - 2 * ext  # l3[j, x] == img_pad[base + Q + j, x] == old b3

    Q = jnp.clip(q + ext, 0.0, 2.0 * ext - 1.001)
    t_idx = jnp.floor(Q / 32.0)
    rem32 = Q - 32.0 * t_idx
    u_idx = jnp.floor(rem32 / 4.0)
    rem4 = rem32 - 4.0 * u_idx
    i_r = jnp.floor(rem4)
    f_r = rem4 - i_r

    # level 1: 32-granule — l1[j] = img_pad[base + 32*t + j], j < jm + 36
    n1 = (2 * ext - 1) // 32 + 1
    h1 = jm + 36
    l1 = jnp.zeros((h1, w), img.dtype)
    for t in range(n1):
        w_t = (t_idx == t).astype(img.dtype)
        l1 = l1 + w_t[None, :] * jax.lax.slice_in_dim(
            img_pad, base + 32 * t, base + 32 * t + h1, axis=0
        )
    # level 2: 4-granule within [0, 32) — l2[j] = l1[4*u + j], j < jm + 4
    h2 = jm + 4
    l2 = jnp.zeros((h2, w), img.dtype)
    for u in range(8):
        w_u = (u_idx == u).astype(img.dtype)
        l2 = l2 + w_u[None, :] * jax.lax.slice_in_dim(
            l1, 4 * u, 4 * u + h2, axis=0
        )
    # level 3: integer remainder + fractional two-tap — exact bilinear
    # row weights: d == i_r gets (1-f), d == i_r + 1 gets f
    b3 = jnp.zeros((jm, w), img.dtype)
    for d in range(5):
        w_d = (
            jnp.where(i_r == d, 1.0 - f_r, 0.0)
            + jnp.where(i_r == d - 1, f_r, 0.0)
        ).astype(img.dtype)
        b3 = b3 + w_d[None, :] * jax.lax.slice_in_dim(l2, d, d + jm, axis=0)

    # stage 3: row scale/offset as a two-diagonal matrix on the MXU
    ys = jnp.arange(hs, dtype=jnp.float32)
    # source row for output row y before the centered shear: q was
    # centered as c*(x - W0/2), so the c*W0/2 remainder folds into p
    p = a * ys + b + c * (w0 / 2.0)
    kf = jnp.clip(p + ext, 0.0, jm - 1.5)
    i0 = jnp.floor(kf)
    f0 = kf - i0
    ks = jnp.arange(jm, dtype=jnp.float32)
    wp = jnp.where(ks[None, :] == i0[:, None], 1.0 - f0[:, None], 0.0) + jnp.where(
        ks[None, :] == i0[:, None] + 1.0, f0[:, None], 0.0
    )
    out = jnp.dot(wp, b3, precision=jax.lax.Precision.HIGH)

    # exact partial-fill coverage on the true source position: bilinear
    # at v in (-1, 0) weights fill by -v, at v in (H-1, H) by v-(H-1);
    # w_in reproduces that 1-px profile exactly (and is 0 fully outside).
    v = p[:, None] + q[None, :]
    w_in = jnp.clip(v + 1.0, 0.0, 1.0) * jnp.clip(hs - v, 0.0, 1.0)
    out = out * w_in + fill * (1.0 - w_in)
    return out[:, :w0]


def affine_warp(
    img: jax.Array, matrix: jax.Array, fill: float, max_shear: float = 0.62
) -> jax.Array:
    """Warp (H, W) image by a forward (2, 3) affine; bilinear, constant fill.

    Gather-free two-pass (Catmull-Smith) decomposition: a vertical then a
    horizontal 1-D resample, each via :func:`_resample_axis0` (see there
    for the TPU rationale; the per-pixel-gather oracle is
    :func:`affine_warp_gather`).  ``max_shear`` (static) must bound both
    pass shear coefficients |m10/m00| = |tan(rot)| and |m01|; the default
    0.62 covers rotations to ~31 deg with inverse scale up to ~1.45.
    Degenerate near-vertical m00 (rotations near 90 deg) is out of the
    supported domain — |m00| is clamped away from 0 for stability.
    """
    h, w = img.shape
    inv = _invert_affine(matrix)
    m00 = jnp.where(
        jnp.abs(inv[0, 0]) < 0.05, jnp.where(inv[0, 0] < 0, -0.05, 0.05), inv[0, 0]
    )
    m01, tx = inv[0, 1], inv[0, 2]
    m10, m11, ty = inv[1, 0], inv[1, 1], inv[1, 2]
    # pass 1 (vertical): V(y, xi) = (m11 - m10*m01/m00)*y + (ty - m10*tx/m00)
    #                               + (m10/m00)*xi
    tmp = _resample_axis0(
        img, m11 - m10 * m01 / m00, ty - m10 * tx / m00, m10 / m00, fill, max_shear
    )
    # pass 2 (horizontal): U(y, xo) = m00*xo + tx + m01*y — same machinery
    # on the transpose (rows become columns)
    out_t = _resample_axis0(tmp.T, m00, tx, m01, fill, max_shear)
    return out_t.T


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
    # static shear bound from the (static) config: pass-1 shear is
    # |tan(rot)|, pass-2 is |m01| <= sin(rot)/scale_min (inverse upscale)
    th = math.radians(min(abs(cfg.rotation_deg), 85.0))
    ms = max(math.tan(th), math.sin(th) / max(cfg.scale_range[0], 0.1), 0.05) + 0.02
    img_w = affine_warp(img, m, cfg.fill_value, max_shear=ms)
    img_w = photometric(kp, img_w, cfg)
    return img_w, transform_points(polys, m)


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key: jax.Array, imgs: jax.Array, polys: jax.Array, cfg: AugmentConfig):
    """(B, H, W) images + (B, P, V, 2) polys under per-sample subkeys."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, i, p: augment_sample(k, i, p, cfg))(keys, imgs, polys)
