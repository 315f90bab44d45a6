"""AVA frame-mAP evaluator tests (reference ``lib/utils/ava_eval_helper.py``
+ ``lib/utils/ava_evaluation/``): IoU math, greedy matching, interpolated
AP against hand-computed values, CSV/labelmap/exclusion contracts, and the
end-to-end file-based entry."""

import numpy as np
import pytest

from procedurevrl_tpu.utils.ava_eval import (
    PascalDetectionEvaluator, box_iou_matrix, compute_average_precision,
    evaluate_ava_from_files, get_ava_eval_data, make_image_key, match_detections,
    read_csv, read_exclusions, read_labelmap, run_evaluation,
)


def test_box_iou_matrix():
    a = np.array([[0, 0, 2, 2]], float)          # area 4
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], float)
    iou = box_iou_matrix(a, b)
    np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-9)


def test_match_detections_greedy_by_score():
    gt = np.array([[0, 0, 1, 1]], float)
    dets = np.array([[0, 0, 1, 1], [0, 0, 1.01, 1.01]], float)
    # higher-score detection wins the single GT; the other is FP
    tp, order = match_detections(dets, [0.3, 0.9], gt)
    assert list(order) == [1, 0]
    assert tp.tolist() == [True, False]


def test_compute_average_precision_hand_case():
    # 2 GT, 3 detections sorted by score: TP, FP, TP
    # precision = [1, 1/2, 2/3]; recall = [1/2, 1/2, 1]
    # envelope -> AP = 0.5*1 + 0.5*(2/3) = 5/6
    precision = np.array([1.0, 0.5, 2 / 3])
    recall = np.array([0.5, 0.5, 1.0])
    assert compute_average_precision(precision, recall) == pytest.approx(5 / 6)


def test_evaluator_corpus_level_map():
    cats = [{"id": 1, "name": "stand"}, {"id": 2, "name": "sit"}]
    ev = PascalDetectionEvaluator(cats)
    # image A: one GT of each class
    ev.add_single_ground_truth_image_info("a,0001", {
        "groundtruth_boxes": np.array([[0, 0, 1, 1], [0, 0, 0.5, 0.5]]),
        "groundtruth_classes": np.array([1, 2]),
    })
    # image B: one class-1 GT
    ev.add_single_ground_truth_image_info("b,0001", {
        "groundtruth_boxes": np.array([[0.2, 0.2, 0.8, 0.8]]),
        "groundtruth_classes": np.array([1]),
    })
    # detections: class 1 perfect on A (score .9), miss on B (off box, .8)
    ev.add_single_detected_image_info("a,0001", {
        "detection_boxes": np.array([[0, 0, 1, 1], [0, 0, 0.5, 0.5]]),
        "detection_classes": np.array([1, 2]),
        "detection_scores": np.array([0.9, 0.7]),
    })
    ev.add_single_detected_image_info("b,0001", {
        "detection_boxes": np.array([[0.6, 0.6, 1.0, 1.0]]),
        "detection_classes": np.array([1]),
        "detection_scores": np.array([0.8]),
    })
    m = ev.evaluate()
    # class 1: dets (0.9 TP), (0.8 FP); 2 GT -> P=[1,.5] R=[.5,.5] -> AP=.5
    assert m["PascalBoxes_PerformanceByCategory/AP@0.5IOU/stand"] == pytest.approx(0.5)
    # class 2: single TP over 1 GT -> AP = 1
    assert m["PascalBoxes_PerformanceByCategory/AP@0.5IOU/sit"] == pytest.approx(1.0)
    assert m["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.75)


def test_detection_on_gt_less_image_counts_fp():
    cats = [{"id": 1, "name": "stand"}]
    ev = PascalDetectionEvaluator(cats)
    ev.add_single_ground_truth_image_info("a,0001", {
        "groundtruth_boxes": np.array([[0, 0, 1, 1]]),
        "groundtruth_classes": np.array([1]),
    })
    ev.add_single_detected_image_info("a,0001", {
        "detection_boxes": np.array([[0, 0, 1, 1]]),
        "detection_classes": np.array([1]),
        "detection_scores": np.array([0.5]),
    })
    ev.add_single_detected_image_info("zzz,0002", {
        "detection_boxes": np.array([[0, 0, 1, 1]]),
        "detection_classes": np.array([1]),
        "detection_scores": np.array([0.9]),
    })
    m = ev.evaluate()
    # sorted: FP(.9), TP(.5) over 1 GT -> P=[0,.5], R=[0,1] -> AP=0.5
    assert m["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.5)


def test_csv_labelmap_exclusions_and_files(tmp_path):
    gt = tmp_path / "gt.csv"
    det = tmp_path / "det.csv"
    lm = tmp_path / "labels.pbtxt"
    ex = tmp_path / "ex.csv"
    gt.write_text(
        "vidA,904,0.1,0.1,0.9,0.9,1\n"
        "vidA,904,0.2,0.2,0.4,0.4,7\n"     # class 7 not in labelmap
        "vidB,905,0.1,0.1,0.9,0.9,1\n"     # excluded timestamp
    )
    det.write_text(
        "vidA,904,0.1,0.1,0.9,0.9,1,0.95\n"
        "vidB,905,0.1,0.1,0.9,0.9,1,0.99\n"
    )
    lm.write_text(
        'item {\n  name: "stand"\n  id: 1\n}\n'
    )
    ex.write_text("vidB,905\n")

    cats, ids = read_labelmap(str(lm))
    assert cats == [{"id": 1, "name": "stand"}] and ids == {1}
    excluded = read_exclusions(str(ex))
    assert excluded == {"vidB,0905"}
    boxes, labels, scores = read_csv(str(gt), ids, load_score=False)
    assert set(boxes) == {"vidA,0904", "vidB,0905"}
    assert labels["vidA,0904"] == [1]          # class 7 filtered
    # boxes stored [y1, x1, y2, x2]
    np.testing.assert_allclose(boxes["vidA,0904"][0], [0.1, 0.1, 0.9, 0.9])

    m = evaluate_ava_from_files(str(lm), str(gt), str(det), str(ex))
    assert m["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)


def test_get_ava_eval_data_box_order():
    scores = np.array([[0.4, 0.6]])
    boxes = np.array([[0.0, 0.1, 0.2, 0.3, 0.4]])  # [batch, x1, y1, x2, y2]
    meta = np.array([[0.0, 17.0]])
    out_boxes, out_labels, out_scores = get_ava_eval_data(
        scores, boxes, meta, {1, 2}, video_idx_to_name={0: "vid"}
    )
    key = "vid,0017"
    assert out_labels[key] == [1, 2]
    # reference shuffle [0,2,1,4,3] then [1:] -> [y1, x1, y2, x2]
    np.testing.assert_allclose(out_boxes[key][0], [0.2, 0.1, 0.4, 0.3])
