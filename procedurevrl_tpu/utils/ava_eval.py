"""AVA frame-mAP evaluation (reference ``lib/utils/ava_eval_helper.py`` +
the ``lib/utils/ava_evaluation/`` suite, ~3.1k LoC).

The reference wraps Google's object-detection API
(``PascalDetectionEvaluator``); the live math is a corpus-level PASCAL
AP@0.5IoU per class.  This module re-implements that core in ~200 lines of
vectorized numpy with the same CSV / labelmap / exclusion contracts and the
same metric keys, replacing the whole vendor suite:

- per image & class: score-sorted greedy matching of detections to
  unmatched ground-truth boxes at IoU >= 0.5 (TP) else FP
  (``per_image_evaluation.PerImageEvaluation``);
- per class over the corpus: precision/recall from globally score-sorted
  TP/FP labels against the total GT count
  (``object_detection_evaluation.ObjectDetectionEvaluation``);
- AP: area under the monotone precision envelope
  (``metrics.compute_average_precision``, VOC2010-style all-point
  interpolation);
- mAP: mean over classes with at least one ground-truth box.

Metric keys match the reference output:
``PascalBoxes_Precision/mAP@0.5IOU`` and
``PascalBoxes_PerformanceByCategory/AP@0.5IOU/<name>``.
"""

from __future__ import annotations

import csv
import time
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Set, Tuple

import numpy as np

from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


def make_image_key(video_id, timestamp) -> str:
    """Unique video-id+timestamp key (reference ava_eval_helper.py:49-51)."""
    return "%s,%04d" % (video_id, int(timestamp))


def read_csv(csv_file, class_whitelist=None, load_score=False):
    """AVA-format CSV -> (boxes, labels, scores) keyed by image key; boxes
    are [y1, x1, y2, x2] (reference ava_eval_helper.py:54-88)."""
    boxes = defaultdict(list)
    labels = defaultdict(list)
    scores = defaultdict(list)
    with open(csv_file, "r") as f:
        for row in csv.reader(f):
            assert len(row) in (7, 8), "Wrong number of columns: " + str(row)
            key = make_image_key(row[0], row[1])
            x1, y1, x2, y2 = (float(n) for n in row[2:6])
            action_id = int(row[6])
            if class_whitelist and action_id not in class_whitelist:
                continue
            boxes[key].append([y1, x1, y2, x2])
            labels[key].append(action_id)
            scores[key].append(float(row[7]) if load_score else 1.0)
    return boxes, labels, scores


def read_exclusions(exclusions_file) -> Set[str]:
    """CSV of video-id,timestamp -> set of excluded image keys
    (reference ava_eval_helper.py:91-106)."""
    excluded = set()
    if exclusions_file:
        with open(exclusions_file, "r") as f:
            for row in csv.reader(f):
                assert len(row) == 2, "Expected only 2 columns, got: " + str(row)
                excluded.add(make_image_key(row[0], row[1]))
    return excluded


def read_labelmap(labelmap_file):
    """pbtxt-style labelmap -> (categories, class id set)
    (reference ava_eval_helper.py:109-124)."""
    labelmap, class_ids = [], set()
    name = ""
    with open(labelmap_file, "r") as f:
        for line in f:
            if line.startswith("  name:"):
                name = line.split('"')[1]
            elif line.startswith("  id:") or line.startswith("  label_id:"):
                class_id = int(line.strip().split(" ")[-1])
                labelmap.append({"id": class_id, "name": name})
                class_ids.add(class_id)
    return labelmap, class_ids


# ---------------------------------------------------------------------------
# evaluation core (replaces lib/utils/ava_evaluation/*)
# ---------------------------------------------------------------------------


def box_iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of [y1, x1, y2, x2] boxes
    (reference ava_evaluation/np_box_ops.py semantics)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)))
    a = np.asarray(boxes_a, float)
    b = np.asarray(boxes_b, float)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    yy1 = np.maximum(a[:, None, 0], b[None, :, 0])
    xx1 = np.maximum(a[:, None, 1], b[None, :, 1])
    yy2 = np.minimum(a[:, None, 2], b[None, :, 2])
    xx2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(yy2 - yy1, 0, None) * np.clip(xx2 - xx1, 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def match_detections(
    det_boxes, det_scores, gt_boxes, iou_threshold: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Score-sorted greedy matching for one image & class; returns a bool
    TP mask aligned with the detections in descending-score order
    (reference ava_evaluation/per_image_evaluation.py)."""
    order = np.argsort(-np.asarray(det_scores))
    tp = np.zeros(len(order), bool)
    if len(gt_boxes) == 0:
        return tp, order
    iou = box_iou_matrix(np.asarray(det_boxes)[order], gt_boxes)
    matched = np.zeros(len(gt_boxes), bool)
    for i in range(len(order)):
        j = int(np.argmax(iou[i]))
        if iou[i, j] >= iou_threshold and not matched[j]:
            tp[i] = True
            matched[j] = True
    return tp, order


def compute_average_precision(precision: np.ndarray, recall: np.ndarray) -> float:
    """Area under the monotone precision envelope
    (reference ava_evaluation/metrics.py:compute_average_precision)."""
    if precision.size == 0:
        return 0.0
    recall = np.concatenate([[0.0], recall, [1.0]])
    precision = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.where(recall[1:] != recall[:-1])[0] + 1
    return float(np.sum((recall[idx] - recall[idx - 1]) * precision[idx]))


class PascalDetectionEvaluator:
    """Corpus-level PASCAL AP@IoU evaluator with the reference's metric-key
    contract (reference ava_evaluation/object_detection_evaluation.py)."""

    def __init__(self, categories: List[dict], matching_iou_threshold=0.5):
        self.categories = categories
        self.iou = matching_iou_threshold
        self._gt: Dict[str, dict] = {}
        self._scores = defaultdict(list)   # class id -> list of scores
        self._tp = defaultdict(list)       # class id -> list of 0/1
        self._num_gt = defaultdict(int)

    def add_single_ground_truth_image_info(self, image_key, gt):
        boxes = np.asarray(gt["groundtruth_boxes"], float).reshape(-1, 4)
        classes = np.asarray(gt["groundtruth_classes"], int).reshape(-1)
        self._gt[image_key] = {"boxes": boxes, "classes": classes}
        for c in classes:
            self._num_gt[int(c)] += 1

    def add_single_detected_image_info(self, image_key, det):
        boxes = np.asarray(det["detection_boxes"], float).reshape(-1, 4)
        classes = np.asarray(det["detection_classes"], int).reshape(-1)
        scores = np.asarray(det["detection_scores"], float).reshape(-1)
        gt = self._gt.get(image_key, {"boxes": np.zeros((0, 4)),
                                      "classes": np.zeros((0,), int)})
        for c in np.unique(classes):
            sel = classes == c
            gsel = gt["classes"] == c
            tp, order = match_detections(
                boxes[sel], scores[sel], gt["boxes"][gsel], self.iou
            )
            self._scores[int(c)].extend(scores[sel][order].tolist())
            self._tp[int(c)].extend(tp.astype(float).tolist())

    def evaluate(self) -> Dict[str, float]:
        aps = []
        metrics = {}
        for cat in self.categories:
            c = int(cat["id"])
            n_gt = self._num_gt.get(c, 0)
            if n_gt == 0:
                continue
            scores = np.asarray(self._scores.get(c, []), float)
            tp = np.asarray(self._tp.get(c, []), float)
            order = np.argsort(-scores)
            tp = tp[order]
            cum_tp = np.cumsum(tp)
            precision = cum_tp / np.arange(1, len(tp) + 1)
            recall = cum_tp / n_gt
            ap = compute_average_precision(precision, recall)
            aps.append(ap)
            metrics[
                f"PascalBoxes_PerformanceByCategory/AP@{self.iou}IOU/{cat['name']}"
            ] = ap
        metrics["PascalBoxes_Precision/mAP@0.5IOU"] = (
            float(np.mean(aps)) if aps else float("nan")
        )
        return metrics


# ---------------------------------------------------------------------------
# driver functions (reference ava_eval_helper.py:127-304)
# ---------------------------------------------------------------------------


def run_evaluation(categories, groundtruth, detections, excluded_keys,
                   verbose=True):
    """reference ava_eval_helper.py:174-248."""
    evaluator = PascalDetectionEvaluator(categories)
    boxes, labels, _ = groundtruth
    for key in boxes:
        if key in excluded_keys:
            logger.info("Excluded timestamp in ground truth: %s (ignored)", key)
            continue
        evaluator.add_single_ground_truth_image_info(
            key, {"groundtruth_boxes": np.array(boxes[key], float),
                  "groundtruth_classes": np.array(labels[key], int)}
        )
    boxes, labels, scores = detections
    for key in boxes:
        if key in excluded_keys:
            logger.info("Excluded timestamp in detections: %s (ignored)", key)
            continue
        evaluator.add_single_detected_image_info(
            key, {"detection_boxes": np.array(boxes[key], float),
                  "detection_classes": np.array(labels[key], int),
                  "detection_scores": np.array(scores[key], float)}
        )
    return evaluator.evaluate()


def get_ava_eval_data(scores, boxes, metadata, class_whitelist,
                      video_idx_to_name=None):
    """Model outputs -> AVA-format keyed dicts; the per-clip box row is
    [batch_idx, x1, y1, x2, y2] and converts to [x1, x2, y1, y2] slots then
    [y1, x1, y2, x2] box order via the same index shuffle as the reference
    (ava_eval_helper.py:251-287)."""
    out_scores = defaultdict(list)
    out_labels = defaultdict(list)
    out_boxes = defaultdict(list)
    for i in range(scores.shape[0]):
        video_idx = int(np.round(metadata[i][0]))
        sec = int(np.round(metadata[i][1]))
        key = video_idx_to_name[video_idx] + "," + "%04d" % sec
        batch_box = boxes[i].tolist()
        batch_box = [batch_box[j] for j in [0, 2, 1, 4, 3]]
        for cls_idx, score in enumerate(scores[i].tolist()):
            if cls_idx + 1 in class_whitelist:
                out_scores[key].append(score)
                out_labels[key].append(cls_idx + 1)
                out_boxes[key].append(batch_box[1:])
    return out_boxes, out_labels, out_scores


def write_results(detections, filename):
    """Official AVA CSV dump (reference ava_eval_helper.py:290-304)."""
    boxes, labels, scores = detections
    with open(filename, "w") as f:
        for key in boxes:
            for box, label, score in zip(boxes[key], labels[key], scores[key]):
                f.write("%s,%.03f,%.03f,%.03f,%.03f,%d,%.04f\n"
                        % (key, box[1], box[0], box[3], box[2], label, score))
    logger.info("AVA results wrote to %s", filename)


def evaluate_ava(preds, original_boxes, metadata, excluded_keys,
                 class_whitelist, categories, groundtruth=None,
                 video_idx_to_name=None, name="latest",
                 output_dir: Optional[str] = None):
    """reference ava_eval_helper.py:137-171; returns the mAP scalar."""
    assert groundtruth is not None, (
        "evaluate_ava needs the (boxes, labels, scores) ground-truth "
        "triple from read_csv"
    )
    t0 = time.time()
    detections = get_ava_eval_data(
        preds, original_boxes, metadata, class_whitelist,
        video_idx_to_name=video_idx_to_name,
    )
    logger.info("Evaluating with %d unique GT frames.", len(groundtruth[0]))
    logger.info("Evaluating with %d unique detection frames", len(detections[0]))
    if output_dir:
        import os

        write_results(detections, os.path.join(output_dir, f"detections_{name}.csv"))
        write_results(groundtruth, os.path.join(output_dir, f"groundtruth_{name}.csv"))
    results = run_evaluation(categories, groundtruth, detections, excluded_keys)
    logger.info("AVA eval done in %f seconds.", time.time() - t0)
    return results["PascalBoxes_Precision/mAP@0.5IOU"]


def evaluate_ava_from_files(labelmap, groundtruth, detections, exclusions):
    """reference ava_eval_helper.py:127-134."""
    categories, class_whitelist = read_labelmap(labelmap)
    excluded_keys = read_exclusions(exclusions)
    gt = read_csv(groundtruth, class_whitelist, load_score=False)
    det = read_csv(detections, class_whitelist, load_score=True)
    return run_evaluation(categories, gt, det, excluded_keys)
