"""Training: one fully-jitted train step + Trainer + CLI entrypoint.

Mirrors the reference's ``train.py`` (SURVEY.md §1 L7, §3.1): CLI over
dataset paths / epochs / batch size / lr / logdir / resume, builds the
model + data generator, runs the fit loop with checkpointing and metric
logging.  TPU-native differences:

  * the whole step — forward, mined loss, backward, optax update, pixel
    metrics — is ONE compiled XLA program (donated state, no host sync in
    the loop body);
  * optional data parallelism via a 1-D ``Mesh('data')`` with batch-sharded
    inputs and replicated params — XLA inserts the gradient all-reduce over
    ICI (SURVEY.md §2c); single-device runs skip the mesh entirely;
  * checkpoints are orbax (params + opt state + step + PRNG key), resumable
    bit-exact (SURVEY.md §3.5, §4.4).

CLI example (mirrors the reference flag surface):
    python -m ubdvss_tpu.train --train-data synthetic --epochs 5 \
        --batch-size 8 --lr 1e-3 --logdir /tmp/run1
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ubdvss_tpu.data import Batches, DataConfig
from ubdvss_tpu.losses import total_loss
from ubdvss_tpu.markup import get_markup_reader
from ubdvss_tpu.metrics import pixel_detection_metrics
from ubdvss_tpu.models.model import get_model, init_params, train_apply
from ubdvss_tpu.net_config import NetConfig
from ubdvss_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch_to_mesh,
)
from ubdvss_tpu.utils.checkpoint import CheckpointManager
from ubdvss_tpu.utils.logging_util import MetricLogger


class TrainState(train_state.TrainState):
    pass


def make_lr_schedule(
    kind: str,
    lr: float,
    warmup_steps: int = 0,
    decay_steps: int = 10_000,
    end_factor: float = 0.01,
):
    """LR schedule factory (the reference's LR-schedule callback analog)."""
    if kind == "constant":
        sched = optax.constant_schedule(lr)
    elif kind == "cosine":
        sched = optax.cosine_decay_schedule(lr, decay_steps, alpha=end_factor)
    elif kind == "exponential":
        sched = optax.exponential_decay(
            lr, decay_steps, decay_rate=end_factor, staircase=False
        )
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    if warmup_steps > 0:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), sched],
            [warmup_steps],
        )
    return sched


def create_train_state(
    cfg: NetConfig,
    lr: float = 1e-3,
    seed: int = 0,
    weight_decay: float = 0.0,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int = 10_000,
) -> TrainState:
    params = init_params(cfg, seed)
    sched = make_lr_schedule(schedule, lr, warmup_steps, decay_steps)
    tx = (
        optax.adamw(sched, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(sched)
    )
    model = get_model(cfg)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(
    state: TrainState, batch: dict, cfg: NetConfig, cls_schedule=None
):
    """One optimization step; returns (new_state, metrics).

    The forward pass auto-routes by static cfg (models/model.train_apply):
    bf16 perf mode trains through the dense-equivalent MXU formulation,
    f32 stays on the flax ≤1e-5-parity path.

    ``cls_schedule``: optional (base, end, ramp_steps) traced triple — the
    classification-loss weight ramps linearly base→end over ramp_steps then
    holds.  Measured (scripts/retrain_asset.py A/B, BASELINE.md r4): the
    ramp makes DETECTION converge ~8× faster (held-out F1 1.0 at 5% of
    the step budget vs 40% for the constant-weight arm, training being
    detection-dominant while the ramp is low) at equal final type
    accuracy.  Computed from state.step on device — no host sync, no
    recompile across steps."""

    cls_w = None
    if cls_schedule is not None:
        base, end, ramp = cls_schedule
        frac = jnp.clip(
            state.step.astype(jnp.float32) / jnp.maximum(ramp, 1.0), 0.0, 1.0
        )
        cls_w = base + (end - base) * frac

    def loss_fn(params):
        with jax.named_scope("fcn_forward"):
            logits = train_apply(params, batch["images"], cfg)
        with jax.named_scope("mined_loss"):
            loss, aux = total_loss(logits, batch["segmap"], cfg, cls_weight=cls_w)
        return loss, (aux, logits)

    with jax.named_scope("grad"):
        (_, (aux, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
    with jax.named_scope("optimizer_update"):
        new_state = state.apply_gradients(grads=grads)
    metrics = dict(aux)
    metrics.update(pixel_detection_metrics(logits[..., 0], batch["segmap"]))
    metrics["grad_norm"] = optax.global_norm(grads)
    if cls_w is not None:
        metrics["cls_weight"] = cls_w
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def checked_train_step(
    state: TrainState, batch: dict, cfg: NetConfig, cls_schedule=None
):
    """Debug-build step with NaN/inf guards (SURVEY.md §5 "Race detection /
    sanitizers"): checkify wraps the same math; the caller throws on the
    first poisoned value.  (index_checks are omitted — checkify's gather
    instrumentation currently breaks on take_along_axis under vmap.)"""
    from jax.experimental import checkify

    def step(state, batch):
        return train_step.__wrapped__(state, batch, cfg, cls_schedule)

    checked = checkify.checkify(step, errors=checkify.float_checks)
    err, out = checked(state, batch)
    return err, out


def _mesh_constrain(mesh):
    """Batch-sharding constraint helper for the fused data-into-step
    programs: returns a pytree function pinning every leaf's leading axis
    to ``mesh``'s first axis (identity when mesh is None).  GSPMD then
    partitions whatever produced the batch — scene synthesis, corpus
    gathers — over the data axis."""
    if mesh is None:
        return lambda batch: batch
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def constrain(batch):
        def c(x):
            spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec)
            )

        return jax.tree.map(c, batch)

    return constrain


def make_fused_synth_step(sc, cfg: NetConfig, dc, mesh=None):
    """ONE-program optimization step over on-device synthesized data:
    scene generation (at the augmented pose) + photometric + rasterize +
    fwd/bwd/adam compile into a single XLA program, so the epoch loop
    issues exactly one dispatch with one scalar argument per step.

    Profiled motivation (r4): on the tunneled dev chip each program
    launch costs ~15-20 ms of host latency — two dispatches per step
    (data program + train program) nearly doubled sustained epoch time;
    on any host the fusion also lets the XLA scheduler overlap synthesis
    with the step's tail instead of serializing at a program boundary.
    Key schedule matches ``DeviceSyntheticBatches.epoch`` fold-for-fold,
    so fused and unfused training consume identical sample streams.

    ``mesh``: data-parallel Mesh → SHARDED synthesis: a sharding
    constraint on the synthesized batch makes GSPMD partition the whole
    per-sample generation pipeline over the mesh's leading axis (scene
    synthesis is embarrassingly batch-parallel), so every chip generates
    only its own shard and the gradient all-reduce rides ICI as usual —
    zero-host multi-chip training with no per-chip feed at all.  Sample
    stream is identical to the single-device path (per-sample keys)."""
    from ubdvss_tpu.synthgen import synth_batch_step

    constrain = _mesh_constrain(mesh)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("steps",))
    def fused(state, ekey, step_idx, cls_schedule=None, steps: int = 1):
        if steps == 1:
            batch = constrain(synth_batch_step.__wrapped__(
                ekey, sc, cfg, dc, True, step_idx
            ))
            return train_step.__wrapped__(state, batch, cfg, cls_schedule)

        # multi-step dispatch: scan `steps` optimization steps inside ONE
        # program — program-launch overhead (≈15 ms on the tunneled dev
        # chip) amortizes 1/steps, and the scheduler overlaps step N's
        # tail with step N+1's synthesis.  Key stream identical to the
        # single-step path (fold_in(ekey, step_idx + s)).
        def body(st, s):
            batch = constrain(synth_batch_step.__wrapped__(
                ekey, sc, cfg, dc, True, step_idx + s
            ))
            return train_step.__wrapped__(st, batch, cfg, cls_schedule)

        state, ms = jax.lax.scan(body, state, jnp.arange(steps))
        return state, jax.tree.map(lambda a: a[-1], ms)

    return fused


def make_fused_cached_step(cfg: NetConfig, dc, mesh=None):
    """ONE-program step over the HBM-resident corpus: epoch-order slice +
    corpus gather + augment + rasterize + fwd/bwd/adam in a single
    dispatch per step (see make_fused_synth_step for why).  Order/key
    values replicate ``DeviceCachedBatches.epoch`` exactly.

    ``mesh``: data-parallel Mesh → the corpus arrives SHARDED over the
    mesh's sample axis (``DeviceCachedBatches.place_on_mesh``) and the
    gathered batch is constrained to batch sharding, so GSPMD partitions
    the whole gather+augment+rasterize+step program: each chip holds 1/N
    of the corpus, fetches its batch shard (cross-shard rows ride ICI
    inside the partitioned gather), and the gradient all-reduce is the
    only other collective — the same treatment the synth pipeline got in
    r4 (VERDICT r4 missing #1).  Sample stream identical to the
    single-device path."""
    from ubdvss_tpu.data import device_batch_step

    constrain = _mesh_constrain(mesh)

    def batch_at(ekey, imgs, polys, nv, ci, order, bi):
        # mirrors data._cached_batch_at (same fold-in/order schedule), with
        # the sharding constraint at the gather boundary so everything
        # downstream of the corpus gather is batch-partitioned
        b = dc.batch_size
        idx = jax.lax.dynamic_slice(order, (bi * b,), (b,))
        gi, gp, gn, gc = constrain(
            (imgs[idx], polys[idx], nv[idx], ci[idx])
        )
        return device_batch_step.__wrapped__(
            jax.random.fold_in(ekey, bi), gi, gp, gn, gc, cfg, dc, True
        )

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("steps",))
    def fused(state, ekey, imgs, polys, nv, ci, order, bi,
              cls_schedule=None, steps: int = 1):
        if steps == 1:
            batch = batch_at(ekey, imgs, polys, nv, ci, order, bi)
            return train_step.__wrapped__(state, batch, cfg, cls_schedule)

        def body(st, b):
            batch = batch_at(ekey, imgs, polys, nv, ci, order, bi + b)
            return train_step.__wrapped__(st, batch, cfg, cls_schedule)

        state, ms = jax.lax.scan(body, state, jnp.arange(steps))
        return state, jax.tree.map(lambda a: a[-1], ms)

    return fused


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(state: TrainState, batch: dict, cfg: NetConfig):
    # same auto-routed forward as train_step so val metrics are computed
    # through the numerics actually being trained
    logits = train_apply(state.params, batch["images"], cfg)
    loss, aux = total_loss(logits, batch["segmap"], cfg)
    metrics = dict(aux)
    metrics.update(pixel_detection_metrics(logits[..., 0], batch["segmap"]))
    return metrics


@dataclasses.dataclass
class Trainer:
    """Fit loop with checkpointing/logging (the reference's fit_generator +
    callbacks: checkpoints incl. save-best, TensorBoard scalars + prediction
    image summaries, LR schedule, optional NaN/inf debug guards)."""

    cfg: NetConfig
    data_cfg: DataConfig
    lr: float = 1e-3
    schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 10_000
    weight_decay: float = 0.0
    logdir: str | None = None
    checkpoint_every: int = 200
    log_every: int = 20
    image_summaries: bool = True
    best_metric: str | None = "pixel_f1"
    debug_checks: bool = False
    seed: int = 0
    mesh: Any | None = None  # jax.sharding.Mesh for data parallelism
    # cls-weight schedule: ramp classification_loss_weight -> cls_weight_end
    # over cls_weight_ramp_steps (None = constant cfg weight)
    cls_weight_end: float | None = None
    cls_weight_ramp_steps: int = 10_000
    # device-resident pipelines only: lax.scan this many optimization
    # steps inside ONE dispatched program (amortizes program-launch
    # overhead; logging/checkpoint cadence quantizes to the chunk).
    # None = auto (16 — see _steps_per_dispatch); 1 = dispatch per step.
    steps_per_dispatch: int | None = None

    def __post_init__(self):
        if self.mesh is not None:
            n = self.mesh.devices.size
            if self.data_cfg.batch_size % n:
                raise ValueError(
                    f"batch_size={self.data_cfg.batch_size} not divisible by "
                    f"the {n}-device data mesh"
                )
        self.state = create_train_state(
            self.cfg,
            self.lr,
            self.seed,
            weight_decay=self.weight_decay,
            schedule=self.schedule,
            warmup_steps=self.warmup_steps,
            decay_steps=self.decay_steps,
        )
        self.state = self.place_state(self.state)
        self.logger = MetricLogger(self.logdir)
        if self.logdir:
            # architecture sidecar: evaluate/detect rebuild the exact model
            # from this instead of requiring CLI flags to match training
            os.makedirs(self.logdir, exist_ok=True)
            with open(f"{self.logdir}/net_config.json", "w") as f:
                f.write(self.cfg.to_json())
        self.ckpt = (
            CheckpointManager(f"{self.logdir}/checkpoints") if self.logdir else None
        )
        self.best_ckpt = (
            CheckpointManager(
                f"{self.logdir}/best",
                max_to_keep=1,
                best_metric=self.best_metric,
            )
            if self.logdir and self.best_metric
            else None
        )
        self._last_val_metrics: dict | None = None
        self._last_train_metrics: dict | None = None
        # fused data-into-step closures, keyed on (pipeline kind, its
        # config, mesh) so a second fit() with a different dataset/mesh
        # rebuilds instead of silently reusing the first (ADVICE r4)
        self._fused_steps: dict = {}

    def _steps_per_dispatch(self, train_batches) -> int:
        """Steps scanned per dispatched program for device-resident
        pipelines.  Auto (steps_per_dispatch=None) picks 16: program
        launch costs 15-45 ms of host latency on high-latency links
        (~0.7-2 steps of chip time at 512²/B=128), so per-step dispatch
        forfeits up to half the sustained rate — 16 bounds launch
        overhead to a few % while log/checkpoint cadence (quantized to
        the chunk) stays usable (VERDICT r4 weak #1)."""
        if self.steps_per_dispatch is not None:
            return max(1, self.steps_per_dispatch)
        return 16

    def maybe_resume(self) -> int:
        if self.ckpt and self.ckpt.latest_step() is not None:
            self.state = self.place_state(self.ckpt.restore(self.state))
            print(f"resumed from step {int(self.state.step)}")
        return int(self.state.step)

    def place_state(self, state: TrainState) -> TrainState:
        """Replicate params/opt state across the data mesh (no-op without
        one).  XLA's GSPMD partitioner then inserts the gradient all-reduce
        over ICI inside the jitted step (SURVEY.md §2c "Data parallel")."""
        if self.mesh is None:
            return state
        return replicate_to_mesh(state, self.mesh)

    def place_batch(self, batch: dict) -> dict:
        """Shard every leaf's leading (batch) dim over the data mesh."""
        if self.mesh is None:
            return batch
        return shard_batch_to_mesh(batch, self.mesh)

    def _cls_sched(self):
        if self.cls_weight_end is None:
            return None
        return jnp.asarray(
            [self.cfg.classification_loss_weight, self.cls_weight_end,
             float(self.cls_weight_ramp_steps)],
            jnp.float32,
        )

    def step_fn(self, state: TrainState, batch: dict):
        """One optimization step on already-placed (state, batch)."""
        sched = self._cls_sched()
        if self.debug_checks:
            err, out = checked_train_step(state, batch, self.cfg, sched)
            err.throw()
            return out
        return train_step(state, batch, self.cfg, sched)

    def _step(self, batch):
        return self.step_fn(self.state, self.place_batch(batch))

    def _epoch_steps(self, train_batches, epoch: int):
        """Yield ``(thunk, n_steps)`` pairs for one epoch, where
        ``thunk: state -> (state, metrics)`` advances ``n_steps``
        optimization steps.

        Device-resident pipelines (DeviceSyntheticBatches /
        DeviceCachedBatches) fuse data production INTO the train program
        (make_fused_synth_step / make_fused_cached_step) and scan
        ``steps_per_dispatch`` steps per program; sample streams are
        identical to the unfused path.  Both fuse under a data mesh too
        (synthesis partitions via the batch constraint; the cached corpus
        is sharded over the mesh and gathered in-program).  Host-fed
        pipelines keep the prefetched batch-then-step loop.  Fusion is
        skipped only under --debug-nan (checkify wraps the unfused step).
        """
        from ubdvss_tpu.data import DeviceCachedBatches, _cached_batch_step
        from ubdvss_tpu.synthgen import DeviceSyntheticBatches
        from ubdvss_tpu.utils.prefetch import prefetched

        fuse = not self.debug_checks
        sched = self._cls_sched()
        if fuse and isinstance(train_batches, DeviceSyntheticBatches):
            # fused closures are cached per (pipeline config, mesh): a
            # second fit() with a different SynthConfig/DataConfig or
            # mesh must not silently reuse the first closure (ADVICE r4)
            fkey = (
                "synth", train_batches.sc, train_batches.data_cfg, self.mesh
            )
            if fkey not in self._fused_steps:
                self._fused_steps[fkey] = make_fused_synth_step(
                    train_batches.sc, self.cfg, train_batches.data_cfg,
                    mesh=self.mesh,
                )
            fused_s = self._fused_steps[fkey]
            ek = jax.random.fold_in(
                jax.random.PRNGKey(train_batches.seed), epoch
            )
            n = len(train_batches)
            k = max(1, min(self._steps_per_dispatch(train_batches), n))
            s = 0
            while s < n:
                kk = min(k, n - s)
                yield (
                    lambda st, s=s, kk=kk: fused_s(
                        st, ek, s, sched, steps=kk
                    ),
                    kk,
                )
                s += kk
            return
        if fuse and isinstance(train_batches, DeviceCachedBatches):
            if self.mesh is not None:
                train_batches.place_on_mesh(self.mesh)
            fkey = ("cached", train_batches.data_cfg, self.mesh)
            if fkey not in self._fused_steps:
                self._fused_steps[fkey] = make_fused_cached_step(
                    self.cfg, train_batches.data_cfg, mesh=self.mesh
                )
            fused_c = self._fused_steps[fkey]
            tb, dc = train_batches, train_batches.data_cfg
            order = np.arange(tb._n)
            rng = np.random.default_rng(dc.seed + epoch)
            if dc.shuffle and tb.train:
                rng.shuffle(order)
            order_dev = jnp.asarray(order, jnp.int32)
            ekey = jax.random.key(dc.seed * 7919 + epoch)
            b = dc.batch_size
            n_full = tb._n // b
            k = max(
                1, min(self._steps_per_dispatch(train_batches), max(n_full, 1))
            )
            bi = 0
            while bi < n_full:
                kk = min(k, n_full - bi)
                yield (
                    lambda st, bi=bi, kk=kk: fused_c(
                        st, ekey, tb._imgs, tb._polys, tb._nv, tb._ci,
                        order_dev, bi, sched, steps=kk,
                    ),
                    kk,
                )
                bi += kk
            if n_full < len(tb):  # partial tail (drop_remainder=False)
                yield (
                    lambda st, bi=n_full: self.step_fn(
                        st,
                        self.place_batch(_cached_batch_step(
                            jax.random.fold_in(ekey, bi),
                            tb._imgs, tb._polys, tb._nv, tb._ci,
                            jnp.asarray(order[bi * b :], jnp.int32),
                            self.cfg, dc, True,
                        )),
                    ),
                    1,
                )
            return
        # one-deep-plus feed/compute overlap: host collate + H2D of
        # batch N+1 run in a worker thread while the chip executes
        # step N (the streaming.py double-buffer pattern for training)
        for batch in prefetched(train_batches.epoch(epoch), depth=2):
            yield (
                lambda st, b=batch: self.step_fn(st, self.place_batch(b)),
                1,
            )

    def _image_summary(self, step: int, batch) -> None:
        """Prediction overlays for the first val images (host, off hot path)."""
        from ubdvss_tpu.ops.postproc import postprocess_batch
        from ubdvss_tpu.utils.visualization import detection_summary_image

        logits = self.state.apply_fn({"params": self.state.params}, batch["images"])
        res = jax.device_get(postprocess_batch(logits, self.cfg))
        imgs = np.asarray(batch["images"])[..., 0] * 127.5 + 127.5
        for i in range(min(2, imgs.shape[0])):
            img = detection_summary_image(
                imgs[i], jax.tree.map(lambda a: a[i], res)
            )
            self.logger.log_image(step, f"predictions_{i}", img)

    def fit(
        self,
        train_batches: Batches,
        epochs: int,
        val_batches: Batches | None = None,
    ) -> TrainState:
        step = int(self.state.step)
        metrics = None
        last_logged = last_saved = step
        for epoch in range(epochs):
            for run, k in self._epoch_steps(train_batches, epoch):
                self.state, metrics = run(self.state)
                step += k
                if step - last_logged >= self.log_every:
                    self.logger.log(step, jax.device_get(metrics), "train")
                    last_logged = step
                if self.ckpt and step - last_saved >= self.checkpoint_every:
                    self.ckpt.save(step, self.state)
                    last_saved = step
            if val_batches is not None:
                agg: dict[str, list] = {}
                first_batch = None
                for batch in val_batches.epoch(0):
                    if first_batch is None:
                        first_batch = batch
                    for k, v in jax.device_get(
                        eval_step(self.state, self.place_batch(batch), self.cfg)
                    ).items():
                        agg.setdefault(k, []).append(v)
                val_metrics = {k: float(np.mean(v)) for k, v in agg.items()}
                self._last_val_metrics = val_metrics
                self.logger.log(step, val_metrics, "val")
                if self.image_summaries and first_batch is not None:
                    self._image_summary(step, first_batch)
                if self.best_ckpt and self.best_metric in val_metrics:
                    self.best_ckpt.save(step, self.state, metrics=val_metrics)
        if metrics is not None:
            self._last_train_metrics = {
                k: float(v) for k, v in jax.device_get(metrics).items()
            }
        if self.ckpt:
            self.ckpt.save(step, self.state)
        return self.state

    def export_params(self, prefer_best: bool = True):
        """Host copy of the trained params — the best-checkpoint ones when a
        save-best checkpointer has ranked any (reference ModelCheckpoint
        save_best_only analog), else the final step's."""
        if prefer_best and self.best_ckpt and self.best_ckpt.best_step() is not None:
            state = self.best_ckpt.restore(
                jax.device_get(self.state), self.best_ckpt.best_step()
            )
            return state.params
        return jax.device_get(self.state.params)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the barcode detector (TPU)")
    p.add_argument("--train-data", required=True,
                   help="dataset root, 'synthetic' (host-rendered), or "
                        "'synthetic-device' (scenes synthesized on device "
                        "inside the jit — zero host feed)")
    p.add_argument("--val-data", default=None)
    p.add_argument("--markup-format", default="zvz-json",
                   help="zvz-json | zvz-xml | synthetic")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--logdir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--train-size", type=int, nargs=2, default=(256, 256),
                   metavar=("H", "W"))
    p.add_argument("--detection-only", action="store_true")
    p.add_argument("--channels", type=int, default=None,
                   help="context-module width (default NetConfig.channels)")
    p.add_argument("--dilations", type=int, nargs="+", default=None,
                   help="context-module dilation schedule")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = mixed-precision training (bf16 trunk "
                        "on the MXU, f32 master weights/optimizer/logits)")
    p.add_argument("--no-separable-context", action="store_true",
                   help="dense 3x3 context convs (~42k params, the "
                        "paper-capacity configuration; see models/model.py)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--synthetic-samples", type=int, default=256)
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="device-resident pipelines: lax.scan this many "
                        "optimization steps inside one dispatched program "
                        "(amortizes launch overhead; logging/checkpoints "
                        "quantize to the chunk).  Default auto (16); pass "
                        "1 to dispatch every step")
    p.add_argument("--cache-device", action="store_true",
                   help="cache the decoded training corpus in device HBM "
                        "(data.DeviceCachedBatches): every epoch after the "
                        "first is step-bound — zero host collate/H2D per "
                        "step; for corpora that fit HBM")
    p.add_argument("--schedule", default="constant",
                   choices=["constant", "cosine", "exponential"])
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--decay-steps", type=int, default=10_000)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--cls-weight-end", type=float, default=None,
                   help="ramp the classification-loss weight linearly from "
                        "its NetConfig value to this over "
                        "--cls-weight-ramp-steps (the cls head converges "
                        "~10x slower than detection)")
    p.add_argument("--cls-weight-ramp-steps", type=int, default=10_000)
    p.add_argument("--export-npz", default=None,
                   help="after training, write portable weights (+ "
                        "net_config sidecar) here — best-checkpoint params "
                        "when available, else final")
    p.add_argument("--debug-nan", action="store_true",
                   help="checkify NaN/inf/OOB guards (debug builds)")
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace into this dir")
    p.add_argument("--num-devices", default=None,
                   help="data-parallel over N devices ('auto' = all); "
                        "batch is sharded per chip, grads all-reduced by XLA")
    p.add_argument("--allow-cpu-mesh", action="store_true",
                   help="permit --num-devices to fall back to virtual host "
                        "CPU devices when it exceeds the accelerator count "
                        "(tests/dry runs; never silent in production)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() before "
                        "mesh construction (DCN across hosts, ICI within)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (multi-host; "
                        "omit on TPU pods where it is auto-detected)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def setup_devices(
    num_devices: str | None,
    distributed: bool = False,
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    allow_cpu_mesh: bool = False,
):
    """Resolve the CLI's device/mesh request → Mesh | None.

    Multi-host wiring (SURVEY.md §2c "Communication backend"): with
    --distributed, ``jax.distributed.initialize()`` must run BEFORE any
    device query or mesh construction so each process sees the global device
    set; the mesh then spans DCN-connected hosts while per-host shards ride
    ICI.  On TPU pods initialize() auto-detects the coordinator; elsewhere
    pass --coordinator/--num-processes/--process-id explicitly.  Restart
    recovery: every process re-runs this entrypoint with --resume and the
    orbax auto-resume picks up the latest checkpoint (SURVEY.md §5).
    """
    if distributed:
        kw = {}
        if coordinator is not None:
            kw = dict(
                coordinator_address=coordinator,
                num_processes=num_processes if num_processes is not None else 1,
                process_id=process_id if process_id is not None else 0,
            )
        jax.distributed.initialize(**kw)
        if jax.process_count() <= 1:
            print("--distributed with a single process; DCN path inactive")
    if num_devices is None:
        return None
    if num_devices == "auto":
        n = None
    else:
        try:
            n = int(num_devices)
        except ValueError:
            raise ValueError(
                f"--num-devices must be an integer or 'auto', got {num_devices!r}"
            ) from None
    devices = jax.devices()
    if n is not None and len(devices) < n:
        # Virtual CPU device set (tests / dry runs — SURVEY.md §4.5: the TPU
        # plugin wins default-backend selection, so fake-device runs must
        # select CPU devices explicitly).  When real accelerators exist this
        # retarget must be EXPLICIT: a typo'd --num-devices on an N-chip host
        # must not silently train the whole job on host CPUs (VERDICT r2
        # weak #1).
        has_accel = any(d.platform != "cpu" for d in devices)
        if has_accel and not allow_cpu_mesh:
            raise ValueError(
                f"--num-devices {n} exceeds the {len(devices)} available "
                f"accelerator device(s); refusing to silently fall back to "
                "host CPU devices — pass --allow-cpu-mesh for virtual-device "
                "tests/dry runs, or lower --num-devices"
            )
        devices = jax.devices("cpu")
    if n is not None and len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return make_mesh(n, axis="data", devices=devices)


def main(argv: list[str] | None = None) -> Trainer:
    args = build_argparser().parse_args(argv)
    mesh = setup_devices(
        args.num_devices,
        args.distributed,
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        allow_cpu_mesh=args.allow_cpu_mesh,
    )
    cfg_kw: dict[str, Any] = {
        "classification": not args.detection_only,
        "dtype": args.dtype,
    }
    if args.channels is not None:
        cfg_kw["channels"] = args.channels
    if args.dilations is not None:
        cfg_kw["dilations"] = tuple(args.dilations)
    if args.no_separable_context:
        cfg_kw["separable_context"] = False
    cfg = NetConfig(**cfg_kw)
    fmt = "synthetic" if args.train_data == "synthetic" else args.markup_format
    reader_kw: dict[str, Any] = {}
    if fmt == "synthetic":
        reader_kw = {"n_samples": args.synthetic_samples,
                     "image_hw": tuple(args.train_size)}
    dc = DataConfig(
        batch_size=args.batch_size,
        train_hw=tuple(args.train_size),
        augment=None if args.no_augment else DataConfig().augment,
        seed=args.seed,
    )
    if args.train_data == "synthetic-device":
        # zero-host pipeline: scenes are synthesized inside the jitted
        # program (synthgen.py) — no host-link dependence; sustained rate
        # is bounded by generate+augment+rasterize+step chip time, not by
        # feed (measured rows: BASELINE.md train-epoch; per-stage split:
        # bench --mode train-epoch --device-synth --stage-breakdown)
        from ubdvss_tpu.synthgen import DeviceSyntheticBatches

        train_b = DeviceSyntheticBatches(
            cfg, dc, n_samples=args.synthetic_samples, seed=args.seed
        )
    else:
        train_reader = get_markup_reader(fmt, args.train_data, **reader_kw)
        if args.cache_device:
            # device-resident corpus: decode+collate once, every epoch is
            # pure device work — step-bound training for datasets that fit
            # HBM (data.DeviceCachedBatches; the host-fed path is
            # feed-bound on slow links, BASELINE.md train-epoch rows)
            from ubdvss_tpu.data import DeviceCachedBatches

            train_b = DeviceCachedBatches(
                train_reader, cfg, dc, train=True, mesh=mesh
            )
        else:
            train_b = Batches(train_reader, cfg, dc, train=True)
    val_b = None
    if args.val_data == "synthetic-device":
        from ubdvss_tpu.synthgen import DeviceSyntheticBatches

        val_b = DeviceSyntheticBatches(
            cfg, dataclasses.replace(dc, shuffle=False),
            n_samples=args.synthetic_samples, seed=args.seed + 1, train=False,
        )
    elif args.val_data:
        vfmt = "synthetic" if args.val_data == "synthetic" else args.markup_format
        val_reader = get_markup_reader(vfmt, args.val_data, **reader_kw)
        val_b = Batches(
            val_reader, cfg, dataclasses.replace(dc, shuffle=False), train=False
        )
    trainer = Trainer(
        cfg,
        dc,
        lr=args.lr,
        schedule=args.schedule,
        warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps,
        weight_decay=args.weight_decay,
        logdir=args.logdir,
        debug_checks=args.debug_nan,
        seed=args.seed,
        mesh=mesh,
        cls_weight_end=args.cls_weight_end,
        cls_weight_ramp_steps=args.cls_weight_ramp_steps,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    if args.resume:
        trainer.maybe_resume()
    from ubdvss_tpu.utils.profiling import trace

    with trace(args.profile):
        trainer.fit(train_b, args.epochs, val_b)
    if args.export_npz:
        from ubdvss_tpu.utils.checkpoint import save_params_npz

        save_params_npz(args.export_npz, trainer.export_params(), cfg=cfg)
    return trainer


if __name__ == "__main__":
    main()
