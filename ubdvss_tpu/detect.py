"""Single-image / directory detection CLI.

Completes the entrypoint surface next to train.py and evaluate.py
(SURVEY.md §3.3's single-image inference path as a command):

    python -m ubdvss_tpu.detect --images scan.png --checkpoint run1 \
        [--output out.json] [--save-overlays outdir]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ubdvss_tpu.inference import BarcodeDetector
from ubdvss_tpu.net_config import NetConfig


def load_params(checkpoint: str, cfg: NetConfig):
    from ubdvss_tpu.models.model import init_params
    from ubdvss_tpu.utils.checkpoint import CheckpointManager, load_params_npz

    if checkpoint.endswith(".npz"):
        return load_params_npz(checkpoint, init_params(cfg, 0))
    if checkpoint.endswith(".h5") or checkpoint.endswith(".keras"):
        from ubdvss_tpu.utils.keras_import import load_keras_weights

        return load_keras_weights(checkpoint, cfg)
    from ubdvss_tpu.train import create_train_state

    state = create_train_state(cfg)
    return CheckpointManager(f"{checkpoint}/checkpoints").restore(state).params


def main(argv=None):
    p = argparse.ArgumentParser(description="Detect barcodes in images")
    p.add_argument("--images", nargs="+", required=True,
                   help="image files or directories")
    p.add_argument("--checkpoint", required=True,
                   help="logdir, params .npz, or Keras .h5")
    p.add_argument("--detection-only", action="store_true")
    p.add_argument("--output", default=None, help="write JSON detections here")
    p.add_argument("--save-overlays", default=None,
                   help="directory for box-overlay images")
    p.add_argument("--int8", action="store_true",
                   help="int8 quantized trunk (PTQ; activation ranges "
                        "calibrated on the input images themselves)")
    args = p.parse_args(argv)

    import cv2

    from ubdvss_tpu.utils.checkpoint import load_net_config

    cfg = load_net_config(args.checkpoint)
    if cfg is None:
        cfg = NetConfig(classification=not args.detection_only)
    elif args.detection_only:
        cfg = cfg.replace(classification=False)
    params = load_params(args.checkpoint, cfg)

    paths: list[Path] = []
    for item in args.images:
        q = Path(item)
        paths.extend(sorted(q.glob("*")) if q.is_dir() else [q])

    qparams = None
    if args.int8:
        import jax.numpy as jnp

        from ubdvss_tpu.ops.preproc import preprocess
        from ubdvss_tpu.ops.quant import build_qparams, calibrate_scales

        scales = None
        pool = []  # common-crop pool for bias correction
        for path in paths[:16]:
            img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
            if img is None:
                continue
            x = preprocess(
                jnp.asarray(img if img.ndim == 2 else img[..., ::-1]),
                cfg.grid_size(img.shape[0], img.shape[1]),
            )
            # per-image shapes differ: merge absmax (min of scales) per image
            s = calibrate_scales(params, cfg, x[None])
            scales = s if scales is None else [
                jnp.minimum(a, b) for a, b in zip(scales, s)
            ]
            pool.append(x)
        if scales is not None:
            qparams = build_qparams(params, cfg, scales)
            # bias correction (quantize_trunk's default, BASELINE.md r5)
            # over a common top-left crop of the calibration images —
            # mean-error statistics are translation-invariant conv
            # outputs, so the crop only perturbs border pixels
            hc = min(min(p.shape[0] for p in pool), 512) // 8 * 8
            wc = min(min(p.shape[1] for p in pool), 512) // 8 * 8
            if hc >= 32 and wc >= 32:
                from ubdvss_tpu.ops.quant import bias_correct_qparams

                calib = jnp.stack([p[:hc, :wc] for p in pool])
                qparams = bias_correct_qparams(qparams, params, cfg, calib)
    det = BarcodeDetector(cfg, params, qparams=qparams)

    report = {}
    for path in paths:
        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        if img.ndim == 3:
            img = img[..., ::-1]
        dets = det.detect(np.asarray(img))
        report[str(path)] = [
            {
                "box": d.box.tolist(),
                "class": d.class_name,
                "score": d.score,
                "angle_deg": d.angle_deg,
            }
            for d in dets
        ]
        print(f"{path}: {len(dets)} detections")
        if args.save_overlays:
            from ubdvss_tpu.utils.visualization import draw_detections

            out = draw_detections(img, np.stack([d.box for d in dets]) if dets else [])
            Path(args.save_overlays).mkdir(parents=True, exist_ok=True)
            cv2.imwrite(
                str(Path(args.save_overlays) / path.name), out[..., ::-1]
            )
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
