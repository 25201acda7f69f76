"""mAP evaluation sanity + behaviour tests."""
import numpy as np

from hvrnet_tpu.core.evaluation import average_precision, eval_map


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(average_precision(rec, prec, "area") - 1.0) < 1e-6


def test_eval_map_perfect_detections():
    # 2 images, 3 classes; detections == gt → mAP 1.0
    gt_bboxes, gt_labels, dets = [], [], []
    rng = np.random.default_rng(0)
    for _ in range(2):
        boxes = np.array([[10, 10, 100, 100], [200, 50, 300, 150]], np.float32)
        labels = np.array([1, 2])
        gt_bboxes.append(boxes)
        gt_labels.append(labels)
        per_class = []
        for c in range(3):
            sel = boxes[labels == c + 1]
            det = (np.hstack([sel, np.ones((len(sel), 1))])
                   if len(sel) else np.zeros((0, 5)))
            per_class.append(det.astype(np.float32))
        dets.append(per_class)
    mean_ap, results = eval_map(dets, gt_bboxes, gt_labels,
                                print_summary=False)
    # classes with gts have AP 1; class 3 has no gts and is excluded
    assert abs(mean_ap - 1.0) < 1e-6


def test_eval_map_false_positive_penalty():
    gt_bboxes = [np.array([[10, 10, 100, 100]], np.float32)]
    gt_labels = [np.array([1])]
    good = np.array([[10, 10, 100, 100, 0.9]], np.float32)
    bad = np.array([[400, 400, 500, 500, 0.95]], np.float32)  # higher score FP
    dets = [[np.vstack([good, bad]), np.zeros((0, 5), np.float32)]]
    mean_ap, _ = eval_map(dets, gt_bboxes, gt_labels, print_summary=False)
    assert 0.4 < mean_ap < 0.6  # precision 0.5 at recall 1


def test_eval_map_imagenet_adaptive_threshold():
    # a small gt gets a laxer threshold under tpfp_imagenet
    gt_bboxes = [np.array([[10, 10, 25, 25]], np.float32)]  # 16x16 box
    gt_labels = [np.array([1])]
    # det with IoU ≈ 0.45 vs gt: fails 0.5 default, passes adaptive
    det = np.array([[10, 10, 21, 25, 0.9]], np.float32)
    dets = [[det]]
    map_default, _ = eval_map(dets, gt_bboxes, gt_labels,
                              dataset=("cls",), print_summary=False)
    map_vid, _ = eval_map(dets, gt_bboxes, gt_labels, dataset="vid",
                          print_summary=False)
    assert map_vid >= map_default
