"""Build class→video index files (counterpart of `/root/reference/cls_video_map.py`).

Scans the VID train imageset, assigns every training video to the classes it
contains (by reading each video's first annotated frame), and writes
`ImageSets/VID/train_<cls>.txt` lists consumed by the triplet-video sampler
(`hvrnet_tpu/data/vid_dataset.py:_get_cls2video`).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import xml.etree.ElementTree as ET
from collections import defaultdict

from hvrnet_tpu.data.vid_dataset import VID_WNIDS, list_from_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="./data/VID/")
    p.add_argument("--ann-file", default=None,
                   help="defaults to <root>/ImageSets/VID_train_15frames.txt")
    p.add_argument("--out-dir", default=None,
                   help="defaults to <root>/ImageSets/VID")
    args = p.parse_args()
    root = args.data_root
    ann_file = args.ann_file or osp.join(root, "ImageSets/VID_train_15frames.txt")
    out_dir = args.out_dir or osp.join(root, "ImageSets/VID")
    os.makedirs(out_dir, exist_ok=True)

    cls_index = {c: i for i, c in enumerate(VID_WNIDS)}
    cls2videos = defaultdict(set)
    seen = set()
    for line in list_from_file(ann_file):
        video_path, _, seg_id, _ = line.strip().split(" ")
        if video_path in seen:
            continue
        seen.add(video_path)
        xml = osp.join(root, "Annotations",
                       "%s/%06d.xml" % (video_path, int(seg_id)))
        if not osp.isfile(xml):
            continue
        for obj in ET.parse(xml).getroot().findall("object"):
            name = obj.find("name").text
            if name in cls_index:
                cls2videos[cls_index[name]].add(video_path)

    for i in range(len(VID_WNIDS)):
        out = osp.join(out_dir, f"train_{i + 1}.txt")
        with open(out, "w") as f:
            for v in sorted(cls2videos.get(i, [])):
                f.write(v + " 1\n")
        print(f"{out}: {len(cls2videos.get(i, []))} videos")


if __name__ == "__main__":
    main()
