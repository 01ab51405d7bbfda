"""Input pipeline: markup samples → batched device tensors + GT segmaps.

Mirrors the reference's Keras ``Sequence`` data generator (SURVEY.md §1 L4,
§3.1) with the host/device split inverted, per BASELINE.json north_star:
the host only *loads* bytes (image decode is inherently host work); all
numeric preprocessing — grayscale, resize-to-grid, normalize, augmentation,
polygon rasterization into target maps — runs on device inside jitted
programs, so the accelerator never waits on OpenCV.

Batch contract (static shapes, cfg-bounded):
  images:   (B, H, W, 1) f32 normalized [-1, 1]
  segmap:   (B, H/scale, W/scale) int32, 0 bg / 1+class_idx
  (polys padded to (B, max_polys, max_verts, 2) with counts; kept for eval)

Heterogeneous image sizes are normalized to ``train_hw`` on device, one
resize program per distinct source shape (cached by jit); datasets with one
dominant shape (synthetic, document scans) compile exactly once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ubdvss_tpu.markup import MarkupReader, Sample
from ubdvss_tpu.net_config import NetConfig
from ubdvss_tpu.ops.augment import AugmentConfig, augment_batch
from ubdvss_tpu.ops.preproc import normalize, resize_bilinear, rgb_to_grayscale
from ubdvss_tpu.ops.rasterize import rasterize_polygons


@dataclasses.dataclass(frozen=True)
class DataConfig:
    batch_size: int = 8
    train_hw: tuple[int, int] = (256, 256)
    max_polys: int = 8
    max_verts: int = 8
    augment: AugmentConfig | None = AugmentConfig()
    shuffle: bool = True
    seed: int = 0
    drop_remainder: bool = True
    # GT-size bound for object-windowed rasterization (grid px): when set,
    # finalize_batch uses rasterize_polygons_windowed (≈10× cheaper on
    # device, exact for polys whose AABB fits the window; LARGER polys are
    # CLIPPED — only set this when the data guarantees the bound).  The
    # on-device synthesis path sets it automatically from its size caps.
    raster_window: int | None = None


def load_image(sample: Sample) -> np.ndarray:
    """Host-side byte loading only (decode). Returns (H, W) or (H, W, 3)."""
    if sample.image is not None:
        return sample.image
    import cv2

    img = cv2.imread(sample.image_path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(sample.image_path)
    if img.ndim == 3:
        img = img[..., ::-1]  # BGR -> RGB
    return img


def pad_polygons(
    sample: Sample, net_cfg: NetConfig, max_polys: int, max_verts: int
):
    """(P, V, 2) f32 polys (input coords), (P,) counts, (P,) 1+class ids."""
    if len(sample.objects) > max_polys:
        # silent GT truncation corrupts both training targets and eval
        # FN counts (ADVICE r1) — surface it; raise DataConfig.max_polys
        import warnings

        warnings.warn(
            f"sample has {len(sample.objects)} objects but max_polys="
            f"{max_polys}; excess ground truth is DROPPED — raise "
            "DataConfig.max_polys",
            stacklevel=2,
        )
    polys = np.zeros((max_polys, max_verts, 2), np.float32)
    n_verts = np.zeros(max_polys, np.int32)
    class_ids = np.zeros(max_polys, np.int32)
    for i, obj in enumerate(sample.objects[:max_polys]):
        pts = obj.points[:max_verts]
        polys[i, : len(pts)] = pts
        n_verts[i] = len(pts)
        if net_cfg.classification:
            class_ids[i] = 1 + net_cfg.class_index(obj.type_name)
        else:
            class_ids[i] = 1
    return polys, n_verts, class_ids


@functools.partial(jax.jit, static_argnames=("out_hw",))
def _to_train_shape(img: jax.Array, polys: jax.Array, out_hw: tuple[int, int]):
    """Grayscale + resize to the common train shape; scale polys to match."""
    x = img.astype(jnp.float32)
    if x.ndim == 3:
        x = rgb_to_grayscale(x, "rgb")
    h, w = x.shape
    x = resize_bilinear(x, out_hw)
    sx = out_hw[1] / w
    sy = out_hw[0] / h
    return x, polys * jnp.array([sx, sy], jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def _batch_to_train_shape(
    imgs: jax.Array, polys: jax.Array, out_hw: tuple[int, int]
):
    """Batched ``_to_train_shape``: (B, H, W[, 3]) uint8 -> (B, H', W') f32.

    One program per distinct source shape instead of B per-sample
    dispatches, and the H2D transfer stays uint8 (4x fewer bytes than
    feeding f32) — the sustained-epoch feed path (bench --mode train-epoch)
    is transfer-bound, so bytes-on-the-wire is the number that matters.
    """
    x = imgs.astype(jnp.float32)
    if x.ndim == 4:
        x = jax.vmap(lambda i: rgb_to_grayscale(i, "rgb"))(x)
    h, w = x.shape[1], x.shape[2]
    x = jax.vmap(lambda i: resize_bilinear(i, out_hw))(x)
    scale = jnp.array([out_hw[1] / w, out_hw[0] / h], jnp.float32)
    return x, polys * scale


def _collate_on_device(imgs_np: list, polys_np: list, out_hw: tuple[int, int]):
    """Host lists -> device (B, H', W') f32 images + scaled polys.

    Same-shaped batches (the common case: synthetic data, uniform scan
    corpora) take the fast path: ONE stacked uint8 H2D + one batched
    program.  Heterogeneous batches fall back to per-sample programs
    (cached by jit per source shape).
    """
    if len({a.shape for a in imgs_np}) == 1:
        return _batch_to_train_shape(
            jnp.asarray(np.stack(imgs_np)),
            jnp.asarray(np.stack(polys_np).astype(np.float32)),
            out_hw,
        )
    xs, ps = [], []
    for a, p in zip(imgs_np, polys_np):
        x, pp = _to_train_shape(jnp.asarray(a), jnp.asarray(p), out_hw)
        xs.append(x)
        ps.append(pp)
    return jnp.stack(xs), jnp.stack(ps)


def finalize_batch(
    imgs: jax.Array,
    polys: jax.Array,
    n_verts: jax.Array,
    class_ids: jax.Array,
    net_cfg: NetConfig,
    data_cfg: DataConfig,
):
    """Normalize + rasterize tail of the batch pipeline (post-augment).

    Shared by :func:`device_batch_step` (host-fed data, geometric warp
    already applied) and ``synthgen.synth_batch_step`` (on-device scenes
    whose augmentation affine is composed into object placement at render
    time, so no warp runs at all).
    """
    x = normalize(imgs)[..., None]
    ho = data_cfg.train_hw[0] // net_cfg.scale
    wo = data_cfg.train_hw[1] // net_cfg.scale
    grid_polys = jnp.round(polys / jnp.float32(net_cfg.scale))
    if data_cfg.raster_window is not None:
        from ubdvss_tpu.ops.rasterize import rasterize_polygons_windowed

        wn = data_cfg.raster_window
        segmap = jax.vmap(
            lambda p, nv, ci: rasterize_polygons_windowed(
                p, nv, ci, (ho, wo), wn
            )
        )(grid_polys, n_verts, class_ids)
    else:
        segmap = jax.vmap(
            lambda p, nv, ci: rasterize_polygons(p, nv, ci, (ho, wo))
        )(grid_polys, n_verts, class_ids)
    return {"images": x, "segmap": segmap, "polys": polys, "n_verts": n_verts,
            "class_ids": class_ids}


@functools.partial(jax.jit, static_argnames=("net_cfg", "data_cfg", "train"))
def device_batch_step(
    key: jax.Array,
    imgs: jax.Array,
    polys: jax.Array,
    n_verts: jax.Array,
    class_ids: jax.Array,
    net_cfg: NetConfig,
    data_cfg: DataConfig,
    train: bool,
):
    """All on-device batch processing: augment → normalize → rasterize.

    imgs: (B, H, W) f32 [0, 255] at train_hw.  Returns the batch contract.
    """
    if train and data_cfg.augment is not None:
        imgs, polys = augment_batch(key, imgs, polys, data_cfg.augment)
    return finalize_batch(imgs, polys, n_verts, class_ids, net_cfg, data_cfg)


class _ReaderSource:
    """grain RandomAccessDataSource over a MarkupReader: workers decode the
    image bytes and pad the polygons; all numerics stay on device."""

    def __init__(self, samples, net_cfg, max_polys, max_verts):
        self._samples = samples
        self._net_cfg = net_cfg
        self._max_polys = max_polys
        self._max_verts = max_verts

    def __len__(self):
        return len(self._samples)

    def __getitem__(self, i):
        s = self._samples[int(i)]
        img = load_image(s)
        polys, n_verts, class_ids = pad_polygons(
            s, self._net_cfg, self._max_polys, self._max_verts
        )
        return {
            "image": np.asarray(img),
            "polys": polys,
            "n_verts": n_verts,
            "class_ids": class_ids,
        }


class GrainBatches:
    """Multi-worker host loading via grain (SURVEY.md §2b: the tf.data
    threading replacement) + the same on-device batch step as ``Batches``.

    Host workers only decode/pad; grayscale/resize/normalize/augment/
    rasterize run on device.  Iteration contract matches ``Batches``.
    """

    def __init__(
        self,
        reader: MarkupReader,
        net_cfg: NetConfig,
        data_cfg: DataConfig,
        train: bool = True,
        worker_count: int = 4,
    ):
        import grain.python as pygrain

        self._pygrain = pygrain
        self.net_cfg = net_cfg
        self.data_cfg = data_cfg
        self.train = train
        self.worker_count = worker_count
        self._source = _ReaderSource(
            reader.samples(), net_cfg, data_cfg.max_polys, data_cfg.max_verts
        )

    def __len__(self) -> int:
        n = len(self._source)
        b = self.data_cfg.batch_size
        return n // b if self.data_cfg.drop_remainder else -(-n // b)

    def epoch(self, epoch: int | None = None) -> Iterator[dict]:
        pygrain = self._pygrain
        dc = self.data_cfg
        epoch = 0 if epoch is None else epoch
        sampler = pygrain.IndexSampler(
            num_records=len(self._source),
            shard_options=pygrain.NoSharding(),
            shuffle=dc.shuffle and self.train,
            num_epochs=1,
            seed=dc.seed + epoch,
        )
        loader = pygrain.DataLoader(
            data_source=self._source,
            sampler=sampler,
            worker_count=self.worker_count,
        )
        key = jax.random.key(dc.seed * 7919 + epoch)
        buf: list[dict] = []
        bi = 0
        for rec in loader:
            buf.append(rec)
            if len(buf) == dc.batch_size:
                yield self._emit(buf, jax.random.fold_in(key, bi))
                bi += 1
                buf = []
        if buf and not dc.drop_remainder:
            yield self._emit(buf, jax.random.fold_in(key, bi))

    def _emit(self, records: list[dict], bkey):
        dc = self.data_cfg
        imgs, polys = _collate_on_device(
            [np.asarray(r["image"]) for r in records],
            [r["polys"] for r in records],
            dc.train_hw,
        )
        return device_batch_step(
            bkey,
            imgs,
            polys,
            jnp.asarray(np.stack([r["n_verts"] for r in records])),
            jnp.asarray(np.stack([r["class_ids"] for r in records])),
            self.net_cfg,
            dc,
            self.train,
        )

    def __iter__(self):
        return self.epoch(0)


class Batches:
    """Iterable over device-ready batches (the reference's generator role)."""

    def __init__(
        self,
        reader: MarkupReader,
        net_cfg: NetConfig,
        data_cfg: DataConfig,
        train: bool = True,
    ):
        self.reader = reader
        self.net_cfg = net_cfg
        self.data_cfg = data_cfg
        self.train = train
        self._samples = reader.samples()
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self._samples)
        b = self.data_cfg.batch_size
        return n // b if self.data_cfg.drop_remainder else -(-n // b)

    def _host_collate(self, samples: list[Sample]):
        cfg, dc = self.net_cfg, self.data_cfg
        imgs, polys, nvs, cids = [], [], [], []
        for s in samples:
            imgs.append(np.asarray(load_image(s)))
            p, nv, ci = pad_polygons(s, cfg, dc.max_polys, dc.max_verts)
            polys.append(p)
            nvs.append(nv)
            cids.append(ci)
        x, p = _collate_on_device(imgs, polys, dc.train_hw)
        return x, p, jnp.asarray(np.stack(nvs)), jnp.asarray(np.stack(cids))

    def epoch(self, epoch: int | None = None) -> Iterator[dict]:
        dc = self.data_cfg
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        order = np.arange(len(self._samples))
        rng = np.random.default_rng(dc.seed + epoch)
        if dc.shuffle and self.train:
            rng.shuffle(order)
        b = dc.batch_size
        n_batches = len(self)
        key = jax.random.key(dc.seed * 7919 + epoch)
        for bi in range(n_batches):
            idx = order[bi * b : (bi + 1) * b]
            if len(idx) < b and dc.drop_remainder:
                break
            batch_samples = [self._samples[i] for i in idx]
            imgs, polys, nvs, cids = self._host_collate(batch_samples)
            bkey = jax.random.fold_in(key, bi)
            yield device_batch_step(
                bkey, imgs, polys, nvs, cids, self.net_cfg, dc, self.train
            )

    def __iter__(self):
        return self.epoch()


@functools.partial(jax.jit, static_argnames=("net_cfg", "data_cfg", "train"))
def _cached_batch_step(
    key, imgs, polys, n_verts, class_ids, idx,
    net_cfg: NetConfig, data_cfg: DataConfig, train: bool,
):
    # leading-axis row gather of the batch from the device-resident corpus
    # (B rows of H*W f32 — bandwidth noise next to the step), then the
    # standard on-device augment/normalize/rasterize
    return device_batch_step(
        key, imgs[idx], polys[idx], n_verts[idx], class_ids[idx],
        net_cfg, data_cfg, train,
    )


@functools.partial(jax.jit, static_argnames=("net_cfg", "data_cfg", "train"))
def _cached_batch_at(
    ekey, imgs, polys, n_verts, class_ids, order, bi,
    net_cfg: NetConfig, data_cfg: DataConfig, train: bool,
):
    """Per-batch program of the cached epoch loop: ALL per-batch
    derivation (key fold-in, epoch-order slice, corpus gather) happens
    inside the jit, so the host loop dispatches exactly one program with
    one 4-byte scalar argument per batch — no host-side PRNG ops and no
    per-batch index uploads (profiled: tiny per-batch host dispatches
    dominate on high-latency links; on any host they are pure overhead).
    Key/order values are identical to ``Batches``' host-side schedule
    (fold_in here == fold_in there), so the cached-vs-streamed parity
    test keeps passing sample-for-sample."""
    b = data_cfg.batch_size
    idx = jax.lax.dynamic_slice(order, (bi * b,), (b,))
    return device_batch_step(
        jax.random.fold_in(ekey, bi),
        imgs[idx], polys[idx], n_verts[idx], class_ids[idx],
        net_cfg, data_cfg, train,
    )


class DeviceCachedBatches:
    """Device-RESIDENT dataset: decode + collate the whole corpus once,
    then every epoch is pure device work (batch gather → augment →
    normalize → rasterize) — zero host collate and zero H2D per step.

    The TPU-native answer for corpora that fit HBM (a 1024-scene 128px
    training set is 67 MB; even 512² x 4096 images is 4 GB of a v5e's
    16 GB): ``Batches`` re-collates and re-transfers every epoch, which on
    a slow host link makes training FEED-bound (measured: BASELINE.md
    train-epoch rows); caching makes every epoch after the first
    step-bound by construction.  Augmentation stays fresh per epoch — it
    runs on device from the per-epoch PRNG key with the same order/key
    schedule as ``Batches``, so cached training sees the identical
    augmented-sample stream (parity-tested in tests/test_data.py).

    Trainer usage: ``train.py --cache-device`` (host-readable datasets),
    or construct directly.  Memory guard: the constructor estimates the
    corpus HBM footprint and raises above ``max_bytes`` (default 8 GB)
    rather than OOMing the chip mid-run.

    ``mesh`` (or a later ``place_on_mesh``): SHARD the corpus over the
    data mesh's leading axis — each chip holds 1/N of the samples, so
    corpus capacity scales with the fleet and the fused DP train program
    (train.make_fused_cached_step(mesh=)) gathers each chip's batch shard
    via GSPMD-partitioned gathers + the gradient all-reduce over ICI,
    instead of re-sharding an unsharded corpus from one device every step
    (VERDICT r4 missing #1).  The epoch order/key schedule is unchanged,
    so sharded training consumes the identical sample stream.
    """

    def __init__(
        self,
        reader: MarkupReader,
        net_cfg: NetConfig,
        data_cfg: DataConfig,
        train: bool = True,
        max_bytes: int = 8 << 30,
        mesh=None,
    ):
        self.net_cfg = net_cfg
        self.data_cfg = data_cfg
        self.train = train
        self.mesh = None
        samples = reader.samples()
        n = len(samples)
        est = n * data_cfg.train_hw[0] * data_cfg.train_hw[1] * 4
        if est > max_bytes:
            raise ValueError(
                f"DeviceCachedBatches: corpus ~{est / 1e9:.1f} GB exceeds "
                f"max_bytes={max_bytes / 1e9:.1f} GB — use Batches/"
                "GrainBatches (streaming) for corpora that don't fit HBM"
            )
        imgs, polys, nvs, cids = [], [], [], []
        for s in samples:
            imgs.append(np.asarray(load_image(s)))
            p, nv, ci = pad_polygons(
                s, net_cfg, data_cfg.max_polys, data_cfg.max_verts
            )
            polys.append(p)
            nvs.append(nv)
            cids.append(ci)
        self._imgs, self._polys = _collate_on_device(
            imgs, polys, data_cfg.train_hw
        )
        self._nv = jnp.asarray(np.stack(nvs))
        self._ci = jnp.asarray(np.stack(cids))
        self._n = n
        if mesh is not None:
            self.place_on_mesh(mesh)

    def place_on_mesh(self, mesh) -> None:
        """Shard the corpus arrays' sample axis over ``mesh``'s leading
        axis (idempotent).  Sample counts that don't divide the mesh are
        zero-padded — pad rows are never referenced (epoch orders only
        index the real ``self._n`` samples)."""
        if self.mesh is mesh:
            return
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        n_dev = mesh.devices.size
        pad = (-self._imgs.shape[0]) % n_dev

        def place(a):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
                )
            spec = PartitionSpec(axis, *([None] * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))

        self._imgs = place(self._imgs)
        self._polys = place(self._polys)
        self._nv = place(self._nv)
        self._ci = place(self._ci)
        self.mesh = mesh

    def __len__(self) -> int:
        b = self.data_cfg.batch_size
        return (
            self._n // b
            if self.data_cfg.drop_remainder
            else -(-self._n // b)
        )

    def epoch(self, epoch: int | None = None) -> Iterator[dict]:
        dc = self.data_cfg
        epoch = 0 if epoch is None else epoch
        # same order/key schedule as Batches so cached vs streamed training
        # is sample-for-sample identical; the order is uploaded ONCE per
        # epoch and the per-batch slice/fold-in happen inside the jit
        # (_cached_batch_at) — the host loop's only per-batch traffic is
        # one scalar batch index
        order = np.arange(self._n)
        rng = np.random.default_rng(dc.seed + epoch)
        if dc.shuffle and self.train:
            rng.shuffle(order)
        order_dev = jnp.asarray(order, jnp.int32)
        ekey = jax.random.key(dc.seed * 7919 + epoch)
        b = dc.batch_size
        n_full = self._n // b
        for bi in range(len(self)):
            if bi < n_full:
                # bi is a traced scalar — one compile covers every batch
                yield _cached_batch_at(
                    ekey, self._imgs, self._polys, self._nv, self._ci,
                    order_dev, bi, self.net_cfg, dc, self.train,
                )
            else:
                # partial tail (drop_remainder=False): explicit short
                # index list — dynamic_slice would duplicate samples
                yield _cached_batch_step(
                    jax.random.fold_in(ekey, bi),
                    self._imgs, self._polys, self._nv, self._ci,
                    jnp.asarray(order[bi * b :], jnp.int32),
                    self.net_cfg, dc, self.train,
                )

    def __iter__(self):
        return self.epoch(0)
