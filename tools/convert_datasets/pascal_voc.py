"""Convert PASCAL VOC annotations into pickled middle format (counterpart of
`/root/reference/tools/convert_datasets/pascal_voc.py`)."""
from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from hvrnet_tpu.data.datasets import VOCDataset  # noqa: E402
from hvrnet_tpu.data.vid_dataset import list_from_file, parse_vid_xml  # noqa: E402
import xml.etree.ElementTree as ET  # noqa: E402


def convert_split(devkit, year, split, out):
    prefix = osp.join(devkit, f"VOC{year}")
    ids = list_from_file(osp.join(prefix, "ImageSets/Main", split + ".txt"))
    cls2idx = {c: i + 1 for i, c in enumerate(VOCDataset.CLASSES)}
    infos = []
    for img_id in ids:
        xml_path = osp.join(prefix, "Annotations", img_id + ".xml")
        ann, (w, h), _ = parse_vid_xml(xml_path, cls2idx)
        infos.append(dict(filename=f"JPEGImages/{img_id}.jpg", width=w,
                          height=h, ann=ann))
    with open(out, "wb") as f:
        pickle.dump(infos, f)
    print(f"{out}: {len(infos)} images")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("devkit_path")
    p.add_argument("--out-dir", default=".")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for year in ("2007", "2012"):
        for split in ("train", "val", "trainval", "test"):
            ann = osp.join(args.devkit_path, f"VOC{year}",
                           "ImageSets/Main", split + ".txt")
            if osp.isfile(ann):
                convert_split(args.devkit_path, year, split,
                              osp.join(args.out_dir, f"voc{year}_{split}.pkl"))


if __name__ == "__main__":
    main()
