"""Object-level evaluation: P/R/F1 at IoU≥0.5 + type accuracy.

Mirrors the reference's ``evaluate.py`` (SURVEY.md §1 L9, §3.2; paper §4.2):
run the model over a markup'd dataset, extract rectangles, greedily match
predictions to ground truth at IoU ≥ 0.5 (predictions in descending score
order, each GT matched at most once), and report object-level
precision/recall/F1 plus barcode-type classification accuracy over the
matched detections, as a structured JSON report.

The device does batched preproc→FCN→postproc in one program per batch
(SURVEY.md §3.2's host-postprocessing stall removed); only the tiny
IoU matching runs on host.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import numpy as np

from ubdvss_tpu.data import Batches, DataConfig
from ubdvss_tpu.inference import detect_program_batch
from ubdvss_tpu.markup import get_markup_reader
from ubdvss_tpu.net_config import NetConfig
from ubdvss_tpu.utils.geometry import iou as polygon_iou


@dataclasses.dataclass
class EvalResult:
    precision: float
    recall: float
    f1: float
    class_accuracy: float
    n_images: int
    n_gt: int
    n_pred: int
    tp: int
    fp: int
    fn: int

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def match_image(
    pred_boxes: np.ndarray,
    pred_scores: np.ndarray,
    pred_classes: np.ndarray,
    gt_polys: list[np.ndarray],
    gt_classes: list[int],
    iou_threshold: float = 0.5,
):
    """Greedy matching for one image; returns (tp, fp, fn, cls_hits, n_matched)."""
    order = np.argsort(-pred_scores)
    matched_gt: set[int] = set()
    tp = fp = cls_hits = 0
    for i in order:
        best_j, best_iou = -1, iou_threshold
        for j, g in enumerate(gt_polys):
            if j in matched_gt:
                continue
            v = polygon_iou(pred_boxes[i], g)
            if v >= best_iou:
                best_iou, best_j = v, j
        if best_j >= 0:
            matched_gt.add(best_j)
            tp += 1
            if int(pred_classes[i]) == int(gt_classes[best_j]):
                cls_hits += 1
        else:
            fp += 1
    fn = len(gt_polys) - len(matched_gt)
    return tp, fp, fn, cls_hits


def evaluate_detections(per_image: list[dict], iou_threshold: float = 0.5) -> EvalResult:
    """per_image entries: pred_boxes/scores/classes + gt_polys/gt_classes."""
    TP = FP = FN = HITS = NGT = NPRED = 0
    for rec in per_image:
        tp, fp, fn, hits = match_image(
            rec["pred_boxes"],
            rec["pred_scores"],
            rec["pred_classes"],
            rec["gt_polys"],
            rec["gt_classes"],
            iou_threshold,
        )
        TP += tp
        FP += fp
        FN += fn
        HITS += hits
        NGT += len(rec["gt_polys"])
        NPRED += len(rec["pred_boxes"])
    precision = TP / max(TP + FP, 1)
    recall = TP / max(TP + FN, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return EvalResult(
        precision=precision,
        recall=recall,
        f1=f1,
        class_accuracy=HITS / max(TP, 1),
        n_images=len(per_image),
        n_gt=NGT,
        n_pred=NPRED,
        tp=TP,
        fp=FP,
        fn=FN,
    )


def run_evaluation(
    params,
    reader,
    cfg: NetConfig,
    data_cfg: DataConfig | None = None,
    iou_threshold: float = 0.5,
) -> EvalResult:
    """Batched device inference over a markup dataset -> EvalResult.

    Images are brought to data_cfg.train_hw like the training/eval pipeline
    (GT polygons are transformed identically, so matching is consistent).
    """
    dc = data_cfg or DataConfig(batch_size=8, shuffle=False, augment=None,
                                drop_remainder=False)
    dc = dataclasses.replace(dc, shuffle=False, augment=None, drop_remainder=False)
    batches = Batches(reader, cfg, dc, train=False)
    per_image = []
    for batch in batches.epoch(0):
        imgs = batch["images"][..., 0] * 127.5 + 127.5  # undo normalize: raw domain
        res, _ = detect_program_batch(params, imgs, cfg, dc.train_hw)
        res = jax.device_get(res)
        polys = np.asarray(batch["polys"])
        n_verts = np.asarray(batch["n_verts"])
        class_ids = np.asarray(batch["class_ids"])
        B = polys.shape[0]
        for b in range(B):
            valid = res["valid"][b]
            gt_polys = [
                polys[b, p, : n_verts[b, p]]
                for p in range(polys.shape[1])
                if n_verts[b, p] >= 3
            ]
            gt_classes = [
                int(class_ids[b, p]) - 1
                for p in range(polys.shape[1])
                if n_verts[b, p] >= 3
            ]
            per_image.append(
                dict(
                    pred_boxes=res["boxes"][b][valid],
                    pred_scores=res["scores"][b][valid],
                    pred_classes=res["classes"][b][valid],
                    gt_polys=gt_polys,
                    gt_classes=gt_classes,
                )
            )
    return evaluate_detections(per_image, iou_threshold)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate the barcode detector")
    p.add_argument("--data", required=True, help="dataset root, or 'synthetic'")
    p.add_argument("--markup-format", default="zvz-json")
    p.add_argument("--checkpoint", required=True,
                   help="logdir with checkpoints/ or a params .npz")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--iou-threshold", type=float, default=0.5)
    p.add_argument("--detection-only", action="store_true")
    p.add_argument("--report", default=None, help="write JSON report here")
    p.add_argument("--synthetic-samples", type=int, default=64)
    return p


def main(argv: list[str] | None = None) -> EvalResult:
    args = build_argparser().parse_args(argv)
    cfg = NetConfig(classification=not args.detection_only)
    from ubdvss_tpu.models.model import init_params
    from ubdvss_tpu.utils.checkpoint import CheckpointManager, load_params_npz

    params = init_params(cfg, 0)
    if str(args.checkpoint).endswith(".npz"):
        params = load_params_npz(args.checkpoint, params)
    else:
        from ubdvss_tpu.train import create_train_state

        state = create_train_state(cfg)
        state = CheckpointManager(f"{args.checkpoint}/checkpoints").restore(state)
        params = state.params
    fmt = "synthetic" if args.data == "synthetic" else args.markup_format
    kw = (
        {"n_samples": args.synthetic_samples, "image_hw": tuple(args.image_size)}
        if fmt == "synthetic"
        else {}
    )
    reader = get_markup_reader(fmt, args.data, **kw)
    dc = DataConfig(batch_size=args.batch_size, train_hw=tuple(args.image_size))
    result = run_evaluation(params, reader, cfg, dc, args.iou_threshold)
    print(result.to_json())
    if args.report:
        with open(args.report, "w") as f:
            f.write(result.to_json())
    return result


if __name__ == "__main__":
    main()
