#!/usr/bin/env python
"""Dense-asset retrain + cls-weight-schedule validation (VERDICT r3 item 4).

Reproduces the r2 pretrained-dense recipe (models/model.py:40-48: dense
context, 1024 host-rendered 128px synthetic scenes, cosine LR, best-epoch
selection by held-out object F1 + type accuracy) as a checked-in script,
with two arms at EQUAL steps:

  --variant constant   classification_loss_weight = 2.0 throughout
                       (the r2 recipe — the baseline arm)
  --variant schedule   cls weight 0.25 -> 4.0 linear ramp over the first
                       40% of steps (train.py train_step cls_schedule:
                       detection stabilizes under near-pure det loss, then
                       classification weight ramps past the constant arm)

Training feeds through data.DeviceCachedBatches (the corpus lives in HBM;
epochs are step-bound), so a 400-epoch arm is minutes on the v5e instead
of the feed-bound hour the host-fed path would take.

Outputs per arm under --out/<variant>/:
  trajectory.jsonl   one line per eval point: step, object F1, type acc
                     (128px held-out scenes), pixel metrics, cls_weight
  best.npz (+ .net_config.json sidecar)   best-epoch params by F1 + acc

The comparison table goes to BASELINE.md; the winning arm ships as
assets/pretrained_dense_synthetic.npz.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python scripts/retrain_asset.py` from anywhere
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["constant", "schedule"],
                    required=True)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=20,
                    help="epochs between held-out object-level evals")
    ap.add_argument("--out", default="/tmp/retrain")
    ap.add_argument("--train-samples", type=int, default=1024)
    ap.add_argument("--val-samples", type=int, default=48)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cls-base", type=float, default=0.25)
    ap.add_argument("--cls-end", type=float, default=4.0)
    ap.add_argument("--ramp-frac", type=float, default=0.4)
    ap.add_argument("--no-augment", action="store_true",
                    help="train on clean renders (no geometric/photometric "
                         "augmentation)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ubdvss_tpu import NetConfig
    from ubdvss_tpu.data import DataConfig, DeviceCachedBatches
    from ubdvss_tpu.evaluate import _collect_batch, evaluate_detections
    from ubdvss_tpu.inference import detect_program_batch
    from ubdvss_tpu.synthetic import SyntheticMarkupReader
    from ubdvss_tpu.train import create_train_state, train_step
    from ubdvss_tpu.utils.checkpoint import save_params_npz

    S = args.image_size
    steps_per_epoch = args.train_samples // args.batch_size
    total_steps = steps_per_epoch * args.epochs
    constant = args.variant == "constant"
    cfg = NetConfig(
        separable_context=False,
        classification_loss_weight=2.0 if constant else args.cls_base,
        max_components=8,
    )
    cls_schedule = None
    if not constant:
        cls_schedule = (
            jnp.float32(args.cls_base),
            jnp.float32(args.cls_end),
            jnp.float32(max(1, int(args.ramp_frac * total_steps))),
        )

    dc = DataConfig(batch_size=args.batch_size, train_hw=(S, S),
                    max_polys=4, seed=args.seed,
                    augment=None if args.no_augment else DataConfig().augment)
    reader = SyntheticMarkupReader(
        n_samples=args.train_samples, image_hw=(S, S), seed=42
    )
    batches = DeviceCachedBatches(reader, cfg, dc, train=True)

    # held-out scenes, unseen seeds (the r2 selection set)
    vreader = SyntheticMarkupReader(
        n_samples=args.val_samples, image_hw=(S, S), seed=4242
    )
    val_imgs = jnp.asarray(np.stack(
        [np.asarray(vreader.sample_at(i).image) for i in range(args.val_samples)]
    ).astype(np.float32))
    from ubdvss_tpu.data import pad_polygons

    vp, vn, vc = [], [], []
    for i in range(args.val_samples):
        p, nv, ci = pad_polygons(vreader.sample_at(i), cfg, 4, 8)
        vp.append(p); vn.append(nv); vc.append(ci)
    vp, vn, vc = np.stack(vp), np.stack(vn), np.stack(vc)

    def object_eval(params):
        res, _ = detect_program_batch(params, val_imgs, cfg, (S, S))
        per_image: list[dict] = []
        _collect_batch(per_image, jax.device_get(res), vp, vn, vc)
        r = evaluate_detections(per_image, class_names=cfg.class_names)
        return float(r.f1), float(r.class_accuracy)

    state = create_train_state(
        cfg, lr=args.lr, seed=args.seed, schedule="cosine",
        decay_steps=total_steps,
    )
    # whole epoch per dispatched program (train.make_fused_cached_step,
    # lax.scan over the epoch's steps) — the 400-epoch arm is minutes
    from ubdvss_tpu.train import make_fused_cached_step

    fused = make_fused_cached_step(cfg, dc)

    def run_epoch(state, epoch):
        import jax.numpy as jnp

        order = np.arange(args.train_samples)
        np.random.default_rng(dc.seed + epoch).shuffle(order)
        return fused(
            state, jax.random.key(dc.seed * 7919 + epoch),
            batches._imgs, batches._polys, batches._nv, batches._ci,
            jnp.asarray(order, jnp.int32), 0, cls_schedule,
            steps=steps_per_epoch,
        )

    outdir = os.path.join(args.out, args.variant)
    os.makedirs(outdir, exist_ok=True)
    traj_path = os.path.join(outdir, "trajectory.jsonl")
    best = (-1.0, -1.0)
    best_path = os.path.join(outdir, "best.npz")
    t0 = time.time()
    with open(traj_path, "w") as traj:
        for epoch in range(args.epochs):
            state, m = run_epoch(state, epoch)
            if (epoch + 1) % args.eval_every and epoch + 1 != args.epochs:
                continue
            f1, acc = object_eval(state.params)
            rec = {
                "epoch": epoch + 1,
                "step": int(state.step),
                "object_f1": round(f1, 4),
                "type_accuracy": round(acc, 4),
                "pixel_f1": round(float(m["pixel_f1"]), 4),
                "cls_weight": round(float(m.get(
                    "cls_weight", cfg.classification_loss_weight)), 3),
                "loss": round(float(m["loss"]), 4),
                "wall_s": round(time.time() - t0, 1),
            }
            traj.write(json.dumps(rec) + "\n")
            traj.flush()
            print(rec)
            if (f1 + acc, f1) > (best[0] + best[1], best[0]):
                best = (f1, acc)
                save_params_npz(best_path, jax.device_get(state.params), cfg)
    print(json.dumps({"variant": args.variant, "best_f1": best[0],
                      "best_acc": best[1], "npz": best_path,
                      "total_steps": int(state.step),
                      "wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
