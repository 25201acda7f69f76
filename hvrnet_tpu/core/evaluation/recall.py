"""Proposal recall evaluation (reference `mmdet/core/evaluation/recall.py`)."""
from __future__ import annotations

from typing import Sequence

import numpy as np

from .mean_ap import bbox_overlaps_np


def _recalls(all_ious, proposal_nums, thrs):
    img_num = all_ious.shape[0]
    total_gt_num = sum(ious.shape[0] for ious in all_ious)
    ious_list = []
    for k in range(len(proposal_nums)):
        tmp = np.zeros((0,), np.float32)
        for i in range(img_num):
            ious = all_ious[i][:, :proposal_nums[k]].copy()
            gt_ious = np.zeros(ious.shape[0])
            if ious.size:
                for j in range(ious.shape[0]):
                    gt_max = ious.max(axis=1)
                    max_idx = gt_max.argmax()
                    gt_ious[j] = gt_max[max_idx]
                    box_idx = ious[max_idx].argmax()
                    ious[max_idx, :] = -1
                    ious[:, box_idx] = -1
            tmp = np.hstack((tmp, gt_ious))
        ious_list.append(tmp)
    all_flat = np.array(ious_list)
    recalls = np.zeros((len(proposal_nums), len(thrs)))
    for i, thr in enumerate(thrs):
        recalls[:, i] = (all_flat >= thr).sum(axis=1) / float(max(total_gt_num, 1))
    return recalls


def eval_recalls(gts, proposals, proposal_nums=None, iou_thrs=None,
                 print_summary: bool = True):
    """gts: list of (m, 4); proposals: list of (n, 4) or (n, 5)."""
    if iou_thrs is None:
        iou_thrs = np.array([0.5])
    elif np.isscalar(iou_thrs):
        iou_thrs = np.array([iou_thrs])
    else:
        iou_thrs = np.asarray(iou_thrs)
    if proposal_nums is None:
        proposal_nums = np.array([100, 300, 1000])
    else:
        proposal_nums = np.atleast_1d(np.asarray(proposal_nums))

    img_num = len(gts)
    assert img_num == len(proposals)
    all_ious = []
    for i in range(img_num):
        prop = proposals[i]
        if prop.ndim == 2 and prop.shape[1] == 5:
            prop = prop[np.argsort(-prop[:, 4])][:, :4]
        prop = prop[:proposal_nums[-1]]
        ious = (bbox_overlaps_np(gts[i], prop)
                if gts[i].size and prop.size
                else np.zeros((gts[i].shape[0], prop.shape[0]), np.float32))
        all_ious.append(ious)
    all_ious = np.array(all_ious, dtype=object)
    recalls = _recalls(all_ious, proposal_nums, iou_thrs)
    if print_summary:
        print("proposal recall:")
        for i, num in enumerate(proposal_nums):
            row = " ".join(f"{recalls[i, j]:.4f}" for j in range(len(iou_thrs)))
            print(f"  @{num}: {row}")
    return recalls
