"""Per-frame visualization of detection results (counterpart of
`/root/reference/inference_vis.py`): draw detections from a results pickle on
the source frames and optionally assemble a video."""
from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle

import cv2
import numpy as np

from hvrnet_tpu.data import VID_CLASSES, build_dataset
from hvrnet_tpu.utils.config import Config


def draw_result(img, per_class_dets, score_thr=0.3):
    for cls_id, dets in enumerate(per_class_dets):
        for det in dets:
            if det[4] < score_thr:
                continue
            x1, y1, x2, y2 = map(int, det[:4])
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 220, 0), 2)
            cv2.putText(img, f"{VID_CLASSES[cls_id]} {det[4]:.2f}",
                        (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (0, 220, 0), 1)
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result")
    p.add_argument("config")
    p.add_argument("--out-dir", default="vis")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--video", default=None, help="write an mp4 as well")
    p.add_argument("--max-frames", type=int, default=500)
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data.test),
                            dict(test_mode=True, world_size=1))
    with open(args.result, "rb") as f:
        results = pickle.load(f)
    os.makedirs(args.out_dir, exist_ok=True)
    writer = None
    fid = 0
    for vinfo in dataset.img_infos:
        for off in range(vinfo["frame_seg_len"]):
            if fid >= min(len(results), args.max_frames):
                break
            path = osp.join(dataset.img_prefix, "JPEGImages",
                            (vinfo["pattern"] % off) + ".JPEG")
            img = cv2.imread(path)
            res = results[fid]
            if img is not None and res is not None:
                if isinstance(res, list) and len(res) == 2 \
                        and isinstance(res[0], list):
                    res = res[1]
                img = draw_result(img, res, args.score_thr)
                cv2.imwrite(osp.join(args.out_dir, f"{fid:06d}.jpg"), img)
                if args.video:
                    if writer is None:
                        h, w = img.shape[:2]
                        writer = cv2.VideoWriter(
                            args.video, cv2.VideoWriter_fourcc(*"mp4v"),
                            25, (w, h))
                    writer.write(img)
            fid += 1
    if writer is not None:
        writer.release()
    print(f"wrote {fid} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
