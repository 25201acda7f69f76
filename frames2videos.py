"""Assemble frame directories into videos (counterpart of
`/root/reference/frames2videos.py`)."""
from __future__ import annotations

import argparse
import os
import os.path as osp

import cv2


def frames_to_video(frame_dir: str, out_path: str, fps: int = 25):
    frames = sorted(f for f in os.listdir(frame_dir)
                    if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not frames:
        return False
    first = cv2.imread(osp.join(frame_dir, frames[0]))
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for f in frames:
        img = cv2.imread(osp.join(frame_dir, f))
        if img is not None:
            writer.write(img)
    writer.release()
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("frames_root", help="dir of frame dirs (or one frame dir)")
    p.add_argument("out_dir")
    p.add_argument("--fps", type=int, default=25)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    subdirs = [d for d in sorted(os.listdir(args.frames_root))
               if osp.isdir(osp.join(args.frames_root, d))]
    if not subdirs:
        subdirs = ["."]
    for d in subdirs:
        src = osp.join(args.frames_root, d)
        name = "video" if d == "." else d
        out = osp.join(args.out_dir, f"{name}.mp4")
        if frames_to_video(src, out, args.fps):
            print(f"{out} written")


if __name__ == "__main__":
    main()
