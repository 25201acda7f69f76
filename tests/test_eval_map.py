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


def test_tpfp_imagenet_gt_only_offset():
    """The -1 offset applies to the GT only (reference mean_ap.py:91),
    so a det can pass the adaptive threshold vs gt-1 while failing vs gt."""
    from hvrnet_tpu.core.evaluation import tpfp_imagenet
    gt = np.array([[20, 20, 40, 40]], np.float32)  # 21x21 → thr ≈ 0.4589
    det = np.array([[15, 15, 35, 35, 0.9]], np.float32)
    # IoU(det, gt-1) = 0.487 > thr; IoU(det, gt) = 0.409 < thr — only the
    # GT-side offset makes this a TP.
    tp, fp = tpfp_imagenet(det, gt, None, 0.5)
    assert tp[0, 0] == 1 and fp[0, 0] == 0


def test_tpfp_imagenet_ignored_gt_matchable():
    """A det matching an ignored gt is neither TP nor FP, and the ignored
    gt becomes covered (reference mean_ap.py:113-129 case 2)."""
    from hvrnet_tpu.core.evaluation import tpfp_imagenet
    gt = np.array([[20, 20, 40, 40], [20, 20, 40, 40]], np.float32)
    ignore = np.array([True, False])
    dets = np.array([[19, 19, 39, 39, 0.95],
                     [19, 19, 39, 39, 0.90]], np.float32)
    tp, fp = tpfp_imagenet(dets, gt, ignore, 0.5)
    # det0 (higher score) covers the ignored gt0: neither tp nor fp;
    # det1 then matches gt1 as TP.
    assert tp[0].tolist() == [0, 1]
    assert fp[0].tolist() == [0, 0]


def test_tpfp_imagenet_covered_gt_skipped_in_search():
    """When a det's best-overlapped gt is already covered, the search must
    skip it and allow matching another uncovered gt (reference :113-116)."""
    from hvrnet_tpu.core.evaluation import tpfp_imagenet
    gt = np.array([[10, 10, 30, 30], [12, 12, 32, 32]], np.float32)
    dets = np.array([[9, 9, 29, 29, 0.95],     # exact match of gt0-1
                     [11, 11, 31, 31, 0.90]],  # best vs gt0, exact vs gt1-1
                    np.float32)
    tp, fp = tpfp_imagenet(dets, gt, None, 0.5)
    assert tp[0].tolist() == [1, 1]
    assert fp[0].tolist() == [0, 0]
